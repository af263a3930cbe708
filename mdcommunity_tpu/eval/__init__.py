from mdcommunity_tpu.eval.metrics import dismantle_greedy, audc_from_curve  # noqa: F401
