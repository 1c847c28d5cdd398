import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/cctpu_xla")
t0 = time.time()
x = jnp.zeros((256, 256))
y = jax.jit(lambda a: (a @ a).sum())(x)
import numpy as np
print("SMOKE_OK", jax.default_backend(), float(np.asarray(y)), f"{time.time()-t0:.1f}s", flush=True)
