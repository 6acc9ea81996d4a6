#!/usr/bin/env python3
"""Persistent TPU experiment server: watches /tmp/tpu_jobs/ for NNN.py files,
execs each in a persistent namespace, writes stdout+traceback to NNN.out.
Keeps the TPU claim alive across experiments (claim costs ~1-5 min)."""
import io
import contextlib
import glob
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

ns = {"jax": jax, "jnp": jnp, "np": np, "time": time}
print("devices:", jax.devices(), flush=True)
_ = int(jnp.zeros((8,)).sum())
open(os.path.join(JOBS, "READY"), "w").write("ok")
print("READY", flush=True)

done = set()
while True:
    for path in sorted(glob.glob(os.path.join(JOBS, "*.py"))):
        if path in done:
            continue
        done.add(path)
        out = io.StringIO()
        t0 = time.time()
        try:
            with contextlib.redirect_stdout(out):
                code = compile(open(path).read(), path, "exec")
                exec(code, ns)
        except BaseException:
            out.write(traceback.format_exc())
        out.write(f"\n[job {time.time()-t0:.2f}s]\n")
        with open(path + ".out", "w") as f:
            f.write(out.getvalue())
    time.sleep(0.3)
