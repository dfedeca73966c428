"""Point-cloud -> Bezier-chain scene I/O (points.scm:10-52).

The reference reads "x,y,z" CSV lines, scales them, slides a 4-point window
over the sequence, and turns each window into a cubic Bezier via
Catmull-Rom-style control points with tightness 1/6 (points.scm:23-41),
then attaches width + material (points.scm:43-50).  Same pipeline here on
numpy, feeding `scene.objects.Bezier` primitives; used by the CSV scenes the
reference left commented out for lack of data files (main.scm:279-314).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .scene import objects as ob

TIGHTNESS = 1.0 / 6.0      # points.scm:24


def load_points(path: str, scale: float = 1.0) -> np.ndarray:
    """points.scm:10-20 — CSV "x,y,z" lines -> [N,3] scaled points.

    Blank lines are skipped; malformed lines raise (the reference would
    crash unhelpfully — SURVEY §5.3)."""
    pts = []
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            parts = line.split(",")
            if len(parts) != 3:
                raise ValueError(f"{path}:{ln}: expected 'x,y,z', got {line!r}")
            pts.append([float(p) for p in parts])
    return np.asarray(pts, np.float64) * scale


def calc_bezier_cp(p0, p1, p2, p3) -> np.ndarray:
    """points.scm:23-26 — inner control points from a 4-point window:
    cp1 = p1 + (p2 - p0)/6, cp2 = p2 - (p3 - p1)/6 (Catmull-Rom)."""
    p0, p1, p2, p3 = (np.asarray(p, np.float64) for p in (p0, p1, p2, p3))
    cp1 = p1 + (p2 - p0) * TIGHTNESS
    cp2 = p2 - (p3 - p1) * TIGHTNESS
    return np.stack([p1, cp1, cp2, p2])


def points_to_bezier_cps(points: np.ndarray) -> np.ndarray:
    """points.scm:28-41 — sliding 4-window: one cubic per interior segment.

    Endpoints clamp (duplicate first/last) so the chain spans every input
    point; the reference instead drops the two end segments — clamping is
    the standard Catmull-Rom boundary and is documented as a conscious fix.
    Returns [M, 4, 3] control points, M = len(points) - 1.
    """
    points = np.asarray(points, np.float64)
    if len(points) < 2:
        raise ValueError("need at least 2 points")
    padded = np.concatenate([points[:1], points, points[-1:]])
    cps = [calc_bezier_cp(padded[i], padded[i + 1], padded[i + 2],
                          padded[i + 3])
           for i in range(len(points) - 1)]
    return np.stack(cps)


def bezier_objs(cps: np.ndarray, width: float,
                material: ob.Material) -> List[ob.Bezier]:
    """points.scm:43-50 — each 4-tuple of CPs -> one Bezier primitive."""
    return [ob.Bezier(np.ascontiguousarray(cp), width, material)
            for cp in np.asarray(cps, np.float64)]


def load_bezier_chain(path: str, width: float, material: ob.Material,
                      scale: float = 1.0) -> List[ob.Bezier]:
    """Full points.scm pipeline: CSV file -> list of Bezier primitives."""
    return bezier_objs(points_to_bezier_cps(load_points(path, scale)),
                       width, material)
