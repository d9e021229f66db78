"""Independent pandas re-implementation of the reference semantics
(app.py:29-198) used as the differential oracle in unit tests.

This is a from-scratch re-statement of the documented behavior (see
SURVEY.md §2), not a copy of the reference code: seeded sinusoid
generators, dropna -> sentinel filter -> quantile clamp -> sort, and
grid/reindex/one-hot synchronization via pandas' own primitives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_camera(n: int = 500, start: pd.Timestamp | None = None, freq_hz: int = 30) -> pd.DataFrame:
    start = start or pd.Timestamp("2024-01-01")
    rng = np.random.default_rng(42)
    # floor to µs: Spark timestamps are µs-precision (SURVEY §1.2)
    ts = (start + pd.to_timedelta(np.arange(n) / freq_hz, unit="s")).floor("us")
    t = np.linspace(0, 4 * np.pi, n)
    df = pd.DataFrame(
        {
            "timestamp": ts,
            "frame_id": np.arange(n, dtype="int64"),
            "object_x": np.sin(t) * 100 + 200,
            "object_y": np.cos(t) * 80 + 150,
            "object_size": np.abs(np.sin(np.linspace(0, 2 * np.pi, n))) * 50 + 20,
            "confidence": np.clip(rng.normal(0.9, 0.1, n), 0, 1),
        }
    )
    noisy = rng.choice(n, size=int(n * 0.05), replace=False)
    df.loc[noisy, "object_x"] = np.nan
    df.loc[noisy[: len(noisy) // 2], "object_y"] = -999.0
    return df


def make_motion(n: int = 600, start: pd.Timestamp | None = None, freq_hz: int = 50) -> pd.DataFrame:
    start = (start or pd.Timestamp("2024-01-01")) + pd.Timedelta(milliseconds=50)
    rng = np.random.default_rng(43)
    ts = (start + pd.to_timedelta(np.arange(n) / freq_hz, unit="s")).floor("us")
    df = pd.DataFrame(
        {
            "timestamp": ts,
            "accel_x": np.sin(np.linspace(0, 6 * np.pi, n)) + rng.normal(0, 0.1, n),
            "accel_y": np.cos(np.linspace(0, 6 * np.pi, n)) + rng.normal(0, 0.1, n),
            "accel_z": np.sin(np.linspace(0, 3 * np.pi, n)) * 0.5 + 9.8 + rng.normal(0, 0.05, n),
            "gyro_x": np.sin(np.linspace(0, 4 * np.pi, n)) * 2 + rng.normal(0, 0.2, n),
            "gyro_y": np.cos(np.linspace(0, 4 * np.pi, n)) * 2 + rng.normal(0, 0.2, n),
            "gyro_z": np.sin(np.linspace(0, 2 * np.pi, n)) + rng.normal(0, 0.15, n),
        }
    )
    spikes = rng.choice(n, size=10, replace=False)
    df.loc[spikes, "accel_x"] *= 10
    return df


def make_log(n: int = 100, start: pd.Timestamp | None = None) -> pd.DataFrame:
    start = (start or pd.Timestamp("2024-01-01")) - pd.Timedelta(milliseconds=100)
    rng = np.random.default_rng(44)
    offsets = np.sort(rng.uniform(0, 16, n))
    types = rng.choice(
        ["GRIPPER_OPEN", "GRIPPER_CLOSE", "ARM_MOVE", "SENSOR_READ", "CALIBRATION", "ERROR", "WARNING"],
        size=n,
        p=[0.15, 0.15, 0.3, 0.2, 0.1, 0.05, 0.05],
    )
    return pd.DataFrame(
        {
            "timestamp": (start + pd.to_timedelta(offsets, unit="s")).floor("us"),
            "event_type": types,
            "joint_1": rng.uniform(-180, 180, n),
            "joint_2": rng.uniform(-90, 90, n),
            "joint_3": rng.uniform(-180, 180, n),
            "gripper_force": rng.uniform(0, 100, n),
        }
    )


def clean_pd(df: pd.DataFrame, sensor_type: str) -> pd.DataFrame:
    out = df.dropna()
    for c in out.select_dtypes(include=[np.number]).columns:
        out = out[~((out[c] < -900) | (out[c] > 10000))]
    if sensor_type == "motion":
        for c in ["accel_x", "accel_y", "gyro_x", "gyro_y", "gyro_z"]:
            if c in out.columns:
                q1, q99 = out[c].quantile(0.01), out[c].quantile(0.99)
                med = out[c].median()
                out[c] = out[c].where(~((out[c] < q1) | (out[c] > q99)), med)
    if "timestamp" in out.columns:
        out = out.sort_values("timestamp").reset_index(drop=True)
    return out


def synchronize_pd(
    camera: pd.DataFrame,
    motion: pd.DataFrame,
    log: pd.DataFrame | None,
    method: str = "nearest",
    step_ms: int = 33,
    tolerance_ms: int = 100,
) -> pd.DataFrame:
    cam = camera.set_index("timestamp")
    mot = motion.set_index("timestamp")
    start = max(cam.index.min(), mot.index.min())
    end = min(cam.index.max(), mot.index.max())
    grid = pd.date_range(start, end, freq=f"{step_ms}ms")
    pad_method = {"pad": "pad", "backfill": "backfill", "nearest": "nearest"}[method]
    cam_a = cam.reindex(grid, method=pad_method).add_prefix("camera_")
    mot_a = mot.reindex(grid, method=pad_method).add_prefix("motion_")
    wide = pd.concat([cam_a, mot_a], axis=1)
    wide.insert(0, "timestamp", grid)
    if log is not None:
        for _, row in log.iterrows():
            diffs = np.abs(grid - row["timestamp"])
            i = int(diffs.argmin())
            if diffs[i] < pd.Timedelta(milliseconds=tolerance_ms):
                col = f"event_{row['event_type']}"
                if col not in wide.columns:
                    wide[col] = 0
                wide.loc[wide.index[i], col] = 1
    wide = wide.dropna().reset_index(drop=True)
    return wide
