"""Capture a jax.profiler trace of the flagship step and print top HLO ops."""

import glob
import gzip
import json
import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ibx.cases import build_rae2822

TRACE_DIR = "/tmp/ibx_trace"


def main():
    which = os.environ.get("IBX_TRACE_CASE", "rae2822")
    if which == "sphere3d":
        from ibx.cases import build_sphere3d

        wall_h = float(os.environ.get("IBX_TRACE_WALL_H", "0.012"))
        case = build_sphere3d(wall_h=wall_h, cfl=0.5, block_size=16)
    else:
        case = build_rae2822(wall_h=5e-4, feature_h=2.5e-4, cfl=0.7,
                             block_size=16)
    P = case.P0
    # trace the MARCH path (fori_loop body) — the bench's loop; per-call
    # step() pays flat<->block relayouts the march amortizes (measured
    # 7.6 ms/step of the 61 ms step() trace on the 2.8M-cell sphere)
    P = case.march(P, 2)  # compile
    jax.block_until_ready(P)

    with jax.profiler.trace(TRACE_DIR):
        P = case.march(P, 20)
        jax.block_until_ready(P)

    print("finite:", bool(np.isfinite(np.asarray(P)).all()))

    xs = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))
    print("xplanes:", xs)
    if not xs:
        return
    # xprof first: the tensorboard_plugin_profile build in this image
    # imports fine but its _pywrap_profiler lacks xspace_to_tools_data
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xs[-1]], "hlo_stats", {})
    out = "/tmp/ibx_trace/hlo_stats.json"
    if isinstance(data, bytes):
        data = data.decode()
    with open(out, "w") as f:
        f.write(data)
    print("wrote", out, len(data))


if __name__ == "__main__":
    main()
