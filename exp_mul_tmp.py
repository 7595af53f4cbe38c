import numpy as np, jax
import homomorph_tpu as hm
from homomorph_tpu.models import circuits
hm.enable_compilation_cache()

def busy(fn, reps=2):
    import glob, gzip, json, tempfile
    jax.block_until_ready(fn())
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                jax.block_until_ready(fn())
        us = 0.0
        for f in glob.glob(f"{td}/**/*.trace.json.gz", recursive=True):
            with gzip.open(f) as fh:
                data = json.load(fh)
            for e in data.get("traceEvents", []):
                if e.get("ph") == "X" and e.get("name","").startswith("jit_") and "dur" in e:
                    us += e["dur"]
    return us / reps / 1e6

mp = hm.Parameters(128, 128, 1, 128)
mctx = hm.Context(mp, source=hm.ThreefrySource(3))
mctx.generate_secret_key(); mctx.generate_public_key()
n_mul = 1024
ma = mctx.encrypt([6] * n_mul, hm.U8, batch=True)
mb = mctx.encrypt([7] * n_mul, hm.U8, batch=True)

@jax.jit
def mul_step(al, bl):
    return circuits.mul_unsigned(hm.Ciphered(al, mp.pk_degree, hm.U8),
                                 hm.Ciphered(bl, mp.pk_degree, hm.U8)).limbs

t = busy(lambda: mul_step(ma.limbs, mb.limbs))
print(f"mul u8 B=1024 device-busy: {t*1e3:.2f} ms -> {n_mul/t:,.0f} muls/s (was 31,995)")
