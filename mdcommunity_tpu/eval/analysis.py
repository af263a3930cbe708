"""Comparison report: join unit-cost vs community results into one CSV
(reference: code/analysis_comparison.py — joins time&audc_*.csv pairs into
results/final_comparison_report.csv with per-dataset deltas)."""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd


def _read_time_audc(path_or_dir: str) -> pd.DataFrame:
    """Accept a time&audc CSV path or a directory containing one."""
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        cands = [f for f in os.listdir(path_or_dir) if f.startswith("time&audc")]
        if not cands:
            raise FileNotFoundError(f"no time&audc_*.csv under {path_or_dir}")
        path = os.path.join(path_or_dir, sorted(cands)[0])
    df = pd.read_csv(path)
    df.columns = [c.strip().lower() for c in df.columns]
    if "dataset" not in df.columns:
        df.columns = ["dataset", "time", "audc"][: len(df.columns)]
    return df


def comparison_report(
    unitcost: str, community: str, output: str = "final_comparison_report.csv"
) -> pd.DataFrame:
    a = _read_time_audc(unitcost).set_index("dataset")
    b = _read_time_audc(community).set_index("dataset")
    df = a.join(b, lsuffix="_unit", rsuffix="_community", how="outer")
    df["audc_delta_pct"] = (
        (df["audc_community"] - df["audc_unit"]) / df["audc_unit"] * 100.0
    )
    df["time_delta_pct"] = (
        (df["time_community"] - df["time_unit"]) / df["time_unit"] * 100.0
    )
    df = df.reset_index()
    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    df.to_csv(output, index=False)
    return df
