from mdcommunity_tpu.models.net import (  # noqa: F401
    init_params,
    train_forward,
    test_forward,
    param_count,
)
