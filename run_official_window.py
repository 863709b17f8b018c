"""One-off: execute the OFFICIAL 1800 s HPCG window (round-4 VERDICT
next-round #4) on the real chip — f32 at 128^3 and df64 — and record the
measured (executed, not projected) rated figures.

Writes WINDOW_r05_f32.json / WINDOW_r05_df64.json next to this file.
Match: the reference's >= 1800 s run protocol,
/root/reference/HPCG/src/hpcg_benchmark.jl:81-88.
"""
import json
import sys
import time

import numpy as np


def run(tag, **kw):
    from partitionedarrays_tpu.models.hpcg.driver import hpcg_benchmark

    t0 = time.time()
    report = hpcg_benchmark(None, **kw)
    s = report.summary()
    out = {
        "tag": tag,
        "wall_s": time.time() - t0,
        "params": {k: (list(v) if isinstance(v, tuple) else v) for k, v in kw.items()},
        "summary": s,
    }
    with open(f"WINDOW_r05_{tag}.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(f"[{tag}] rated={s['GFLOPs']['rated']} raw={s['GFLOPs']['raw']} "
          f"window={s.get('phase3_window')} relres={s['final_relres']} "
          f"wall={out['wall_s']:.0f}s", flush=True)
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "f32"):
        run(
            "f32",
            local_shape=(128, 128, 128),
            parts_per_dir=(1, 1, 1),
            n_levels=4,
            iterations=50,
            ref_sets=1,
            total_runtime=1800.0,
            dtype=np.float32,
        )
    if which in ("both", "df64"):
        run(
            "df64",
            local_shape=(128, 128, 128),
            parts_per_dir=(1, 1, 1),
            n_levels=4,
            iterations=50,
            ref_sets=1,
            total_runtime=1800.0,
            precision="df64",
        )
