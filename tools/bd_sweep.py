"""BD calibration sweep: re-encode the compare_reference clip with OUR
encoder under different decision-constant overrides (env vars read by
tpu/encode.py) and report the BD-rate against reference points from an
existing BD_*.json artifact — without re-running the reference encoder.

Each config runs in a subprocess because the constants bake into the
traced graphs at first trace.

Usage:
  python tools/bd_sweep.py BD_r05_cif_ipp.json "NAME=VAL,NAME=VAL" ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = """
import os, sys, json, tempfile
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
os.environ["JAX_PLATFORMS"] = "cpu"
import importlib
cr = importlib.import_module("compare_reference")
cr._pin_cpu()
spec = json.loads(sys.argv[1])
w, h = spec["dims"]; n = spec["frames"]; ip = spec["intra_period"]
clip = tempfile.mktemp(suffix=".yuv")
frames = cr.make_clip_scene(w, h, n, clip)
out = []
for row in spec["rows"]:
    qp = row["qp"]
    so, _ = cr.run_ours(clip, w, h, n, qp, spec["preset"], ip)
    out.append({"qp": qp, "bytes": len(so),
                "psnr": cr.psnr_stream(so, frames)})
print("RESULT " + json.dumps(out))
"""


def main():
    art = json.load(open(sys.argv[1]))
    configs = sys.argv[2:] or [""]
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from compare_reference import bd_rate
    ref_r = np.array([r["ref_bytes"] for r in art["rows"]], float)
    ref_p = np.array([r["ref_psnr"] for r in art["rows"]], float)
    base_r = np.array([r["ours_bytes"] for r in art["rows"]], float)
    base_p = np.array([r["ours_psnr"] for r in art["rows"]], float)
    print(f"artifact baseline bd: "
          f"{bd_rate(ref_r, ref_p, base_r, base_p):+.1f}%")
    for cfg in configs:
        env = dict(os.environ)
        for kv in filter(None, cfg.split(",")):
            k, v = kv.split("=")
            env[k] = v
        r = subprocess.run([sys.executable, "-c", _CHILD,
                            json.dumps(art)],
                           capture_output=True, text=True, env=env)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            print(f"{cfg or 'default':40s} FAILED\n{r.stderr[-800:]}")
            continue
        rows = json.loads(line[0][7:])
        rr = np.array([x["bytes"] for x in rows], float)
        pp = np.array([x["psnr"] for x in rows], float)
        bd = bd_rate(ref_r, ref_p, rr, pp)
        detail = " ".join(f"q{x['qp']}:{x['bytes']/1e3:.1f}kB/"
                          f"{x['psnr']:.2f}dB" for x in rows)
        print(f"{cfg or 'default':40s} bd {bd:+6.1f}%  {detail}")


if __name__ == "__main__":
    main()
