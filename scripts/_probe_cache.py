"""Pickle cache for probe-script offline data (mesh gen + assembly +
packing run on one host core and dominate probe wall time — e.g. the
airfoil decompose+pack is ~100 s).  Keyed by a caller-supplied tag PLUS
a fingerprint of the offline-pipeline sources, so editing
geometry/assembly/packing code invalidates stale entries automatically.
Invalidated manually by deleting /root/.cache/ryujin_probe or setting
RYUJIN_PROBE_NOCACHE=1.  Probes only — the framework itself rebuilds
offline data from config (driver.py)."""

import glob
import hashlib
import os
import pickle


CACHE_DIR = os.environ.get(
    "RYUJIN_PROBE_CACHE", "/root/.cache/ryujin_probe"
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _code_fingerprint() -> str:
    """Short hash over the offline-pipeline sources (the code whose edits
    change packed data): ryujin_tpu/offline/*.py + native/assembly.cc."""
    h = hashlib.sha256()
    files = sorted(
        glob.glob(os.path.join(_REPO, "ryujin_tpu", "offline", "*.py"))
        + glob.glob(os.path.join(_REPO, "ryujin_tpu", "native", "*"))
    )
    for path in files:
        if os.path.isfile(path):
            with open(path, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:12]


_FP = None


def cached(tag: str, build):
    """Return build() memoized into CACHE_DIR/<tag>-<code_hash>.pkl."""
    global _FP
    if os.environ.get("RYUJIN_PROBE_NOCACHE") == "1":
        return build()
    if _FP is None:
        _FP = _code_fingerprint()
    path = os.path.join(CACHE_DIR, f"{tag}-{_FP}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                out = pickle.load(f)
            import time

            age = time.time() - os.path.getmtime(path)
            print(
                f"probe cache HIT {path} (written {age / 60:.0f} min ago;"
                " keyed by tag + offline-code fingerprint)",
                flush=True,
            )
            return out
        except Exception as exc:  # stale/corrupt: rebuild
            print(f"probe cache {path}: {exc}; rebuilding", flush=True)
    out = build()
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(out, f)
    os.replace(tmp, path)
    return out
