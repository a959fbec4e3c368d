import time, sys
t0 = time.time()
import jax
try:
    d = jax.devices()
    print("OK", d, f"{time.time()-t0:.0f}s", flush=True)
except Exception as e:
    print("FAIL", type(e).__name__, str(e)[:200], f"{time.time()-t0:.0f}s", flush=True)
    sys.exit(1)
