"""Pickle cache for probe-script offline data (mesh gen + assembly +
packing run on one host core and dominate probe wall time — e.g. the
airfoil decompose+pack is ~100 s).  Keyed by a caller-supplied tag;
invalidated by deleting /root/.cache/ryujin_probe or setting
RYUJIN_PROBE_NOCACHE=1.  Probes only — the framework itself rebuilds
offline data from config (driver.py)."""

import os
import pickle


CACHE_DIR = os.environ.get(
    "RYUJIN_PROBE_CACHE", "/root/.cache/ryujin_probe"
)


def cached(tag: str, build):
    """Return build() memoized into CACHE_DIR/<tag>.pkl."""
    if os.environ.get("RYUJIN_PROBE_NOCACHE") == "1":
        return build()
    path = os.path.join(CACHE_DIR, tag + ".pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                out = pickle.load(f)
            import time

            age = time.time() - os.path.getmtime(path)
            print(
                f"probe cache HIT {path} (written {age / 60:.0f} min ago;"
                " the tag does not fingerprint code — delete the file or"
                " set RYUJIN_PROBE_NOCACHE=1 after changing"
                " geometry/assembly/packing)",
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
