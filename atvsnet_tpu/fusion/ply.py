"""Binary little-endian PLY point cloud writer.

Format matches reference fusibile/displayUtils.h:80-136: xyz float32 + RGB uchar
(normals commented out there too).
"""

from __future__ import annotations

import numpy as np


def write_ply(path: str, points: np.ndarray, colors: np.ndarray) -> None:
    points = np.asarray(points, "<f4")
    colors = np.asarray(colors, np.uint8)
    assert points.shape == colors.shape and points.shape[1] == 3
    from atvsnet_tpu.native import write_ply_native

    if write_ply_native(path, points, colors):
        return
    n = points.shape[0]
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    rec["xyz"] = points
    rec["rgb"] = colors
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        rec.tofile(f)


def read_ply(path: str):
    """Minimal reader for the format written above (for tests/round-trips)."""
    with open(path, "rb") as f:
        n = None
        while True:
            raw = f.readline()
            if not raw:  # EOF before end_header: truncated / not a PLY
                raise ValueError(f"no end_header in PLY file: {path!r}")
            line = raw.decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line == "end_header":
                break
        rec = np.fromfile(f, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)], count=n)
    return rec["xyz"].copy(), rec["rgb"].copy()
