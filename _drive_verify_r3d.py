"""Round-3 session-3 verify drive: packed fused attention block + fused-fetch
caption pipeline on the real chip."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/cctpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from construction_clip_tpu.core.configs import CLIPConfig, ClipCapConfig, GPT2Config
from construction_clip_tpu.core.precision import BF16_POLICY
from construction_clip_tpu.models.clip import init_clip, encode_image

cfg = CLIPConfig.vit_b_32()
params = init_clip(jax.random.key(0), cfg)
x = jax.random.normal(jax.random.key(1), (8, 224, 224, 3), jnp.float32)
fn = jax.jit(lambda p, x: encode_image(p, cfg, x, policy=BF16_POLICY, normalize=True))
out = np.asarray(fn(params, x))
print("encode (packed fused block, pallas):", jax.default_backend(), out.shape,
      float(np.linalg.norm(out[0])), flush=True)

# parity on chip: packed pallas vs xla path
from construction_clip_tpu.ops import attention as attn_ops
attn_ops.set_impl("xla")
fn2 = jax.jit(lambda p, x: encode_image(p, cfg, x, policy=BF16_POLICY, normalize=True))
out_xla = np.asarray(fn2(params, x))
attn_ops.set_impl("pallas")
dev = float(np.max(np.abs(out - out_xla)))
print(f"on-chip packed-pallas vs xla encode max|diff|: {dev:.5f}", flush=True)
assert dev < 0.02, dev

# caption pipeline end-to-end (fused single-fetch path)
import gzip, tempfile
from construction_clip_tpu.data.clip_tokenizer import ClipTokenizer
from construction_clip_tpu.infer.caption import CaptionPipeline
from construction_clip_tpu.models.clipcap import init_clipcap

with tempfile.NamedTemporaryFile(suffix=".txt.gz", delete=False) as f:
    pass
with gzip.open(f.name, "wt", encoding="utf-8") as g:
    g.write("version\n")

class IdTok:
    def encode(self, text):
        return [min(ord(c) % 20000 + 100, 21000) for c in text][:20]
    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(0x4E00 + int(i) % 2000) for i in ids)

gcfg, ccfg = GPT2Config(), ClipCapConfig()
pipe = CaptionPipeline(
    clip_params=params, clip_cfg=cfg,
    cap_params=init_clipcap(jax.random.key(2), ccfg, gcfg), ccfg=ccfg, gcfg=gcfg,
    clip_tokenizer=ClipTokenizer(f.name, n_merges=None), lm_tokenizer=IdTok(),
    max_steps=30)
os.unlink(f.name)
imgs = jax.random.uniform(jax.random.key(3), (4, 224, 224, 3))
t0 = time.perf_counter()
res = pipe.caption_images(imgs, use_beam=False)
print(f"caption_images greedy B=4: {time.perf_counter()-t0:.1f}s "
      f"-> {[r['caption_type'] for r in res]} cap0={res[0]['caption'][:8]!r}", flush=True)
t0 = time.perf_counter()
res_b = pipe.caption_images(imgs, use_beam=True)
print(f"caption_images beam B=4: {time.perf_counter()-t0:.1f}s "
      f"attr0={res_b[0]['attribute']!r}", flush=True)
res_a = pipe.caption_images(imgs, attributes=["缺失 墜落 "] * 4, use_beam=False)
print("explicit-attribute path ok:", res_a[0]["attribute"], flush=True)
print("VERIFY_OK", flush=True)
