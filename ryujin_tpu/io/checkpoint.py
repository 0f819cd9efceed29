"""Checkpoint / resume.

TPU-native analog of TimeLoop::write_checkpoint / read_checkpoint
(/root/reference/source/time_loop.template.h:440-611): the reference
serializes each state component through SolutionTransfer attached to the
p4est triangulation plus a boost metadata archive; here the packed nodal
state plus (t, cycle) metadata land in a single .npz whose mesh fingerprint
guards against resuming onto a different discretization.  Previous files
rotate to `~` backups exactly like the reference.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Tuple

import numpy as np


def mesh_fingerprint(mesh) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(mesh.vertices).tobytes())
    h.update(np.ascontiguousarray(mesh.cells).tobytes())
    return h.hexdigest()[:16]


def write_checkpoint(basename: str, mesh, U, t: float, cycle: int,
                     extra: Optional[dict] = None) -> str:
    """Write `basename-checkpoint.npz` (rotating an existing file to ~).

    extra: additional named arrays serialized alongside the state — the
    driver passes the quantities time-average accumulators so statistics
    survive a resume (the reference serializes the full state vector +
    metadata, time_loop.template.h:537-611)."""
    name = f"{basename}-checkpoint.npz"
    if os.path.exists(name):
        os.replace(name, name + "~")
    np.savez_compressed(
        name,
        U=np.asarray(U),
        t=float(t),
        cycle=int(cycle),
        fingerprint=mesh_fingerprint(mesh),
        **{f"x_{k}": np.asarray(v) for k, v in (extra or {}).items()},
    )
    return name


def read_checkpoint(
    basename: str, mesh
) -> Tuple[np.ndarray, float, int, dict]:
    name = f"{basename}-checkpoint.npz"
    with np.load(name, allow_pickle=False) as z:
        fp = str(z["fingerprint"])
        if fp != mesh_fingerprint(mesh):
            raise ValueError(
                "checkpoint does not match the current discretization"
            )
        extra = {
            k[2:]: z[k] for k in z.files if k.startswith("x_")
        }
        return z["U"], float(z["t"]), int(z["cycle"]), extra
