import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/cctpu_xla")
from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.models.clip import init_clip, encode_image
cfg = CLIPConfig.vit_b_32(); params = init_clip(jax.random.key(0), cfg)
out = jax.jit(lambda p, x: encode_image(p, cfg, x, policy=BF16_POLICY, normalize=True))(
    params, jnp.zeros((8, 224, 224, 3)))
print("smoke:", jax.default_backend(), out.shape, float(jnp.linalg.norm(np.asarray(out)[0])))

# serve path: exercise the reverted batcher end-to-end on the chip
import threading, time
from construction_clip_tpu.serve.app import PredictService
svc = PredictService.create_random(seed=0)
res = svc.predict_image(np.zeros((240, 320, 3), np.uint8))
print("serve single:", sorted(res.keys()))
outs = [None] * 8
def hit(i):
    outs[i] = svc.predict_image(np.full((224, 224, 3), i, np.uint8))
ts = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
t0 = time.perf_counter()
[t.start() for t in ts]; [t.join() for t in ts]
print("serve 8-way batched: %.0f ms, all ok=%s" % (
    1000 * (time.perf_counter() - t0), all(o is not None and "caption" in o for o in outs)))
print("VERIFY_OK")
