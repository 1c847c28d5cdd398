"""Relevance-propagation explainability (Chefer-style grad x attention).

Reference behavior (reference attention.py:14-73): for the target image-text logit,
take grad of the score w.r.t. each block's attention probabilities, form
cam = clamp(grad * probs, 0).mean(heads), and propagate R += cam @ R through the
blocks from `start_layer` (default -1: last block only), separately for the vision
and text towers; then render R_image[0, 1:] as a bilinear-upsampled JET heatmap
(attention.py:75-99) and R_text as per-token scores (attention.py:113-143).

The reference needs a FORKED CLIP exposing `blk.attn_probs` hooks (attention.py:2,32).
Here no fork: ops/attention.py has a differentiation port (`probs_probe`, zeros added
to the probabilities), so grad w.r.t. the probe IS grad w.r.t. the probs — one
jax.grad call per tower, no hooks, fully jittable.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from construction_clip_tpu.core.configs import CLIPConfig
from construction_clip_tpu.core.precision import Policy, DEFAULT_POLICY
from construction_clip_tpu.models.clip import encode_image, encode_text


def _propagate(probs, grads, start_layer: int):
    """probs/grads: [L, B, H, T, T] -> relevance R [B, T, T]."""
    L, B, H, T, _ = probs.shape
    cam = jnp.clip(grads * probs, 0, None).mean(axis=2)  # [L, B, T, T]
    R = jnp.broadcast_to(jnp.eye(T, dtype=cam.dtype), (B, T, T))
    start = start_layer % L
    def body(R, c):
        layer_idx, cam_l = c
        upd = R + jnp.einsum("bij,bjk->bik", cam_l, R)
        return jnp.where(layer_idx >= start, upd, R), None
    idx = jnp.arange(L)
    R, _ = jax.lax.scan(body, R, (idx, cam))
    return R - jnp.broadcast_to(jnp.eye(T, dtype=cam.dtype), (B, T, T))


@functools.partial(jax.jit, static_argnames=("cfg", "start_layer", "start_layer_text",
                                             "policy"))
def interpret(params, cfg: CLIPConfig, images, tokens, *,
              start_layer: int = -1, start_layer_text: int = -1,
              policy: Policy = DEFAULT_POLICY):
    """images [B,H,W,3] preprocessed, tokens [B,ctx]. Pairs row-wise (image i with
    text i, the diagonal one-hot of reference attention.py:20-23).

    Returns (R_text [B, ctx, ctx], R_image [B, T_img, T_img]); row 0 of each
    (CLS/EOT row) is the token/patch relevance the reference visualizes.
    """
    v, t = cfg.vision, cfg.text
    B = images.shape[0]
    probe_v = jnp.zeros((v.layers, B, v.heads, v.seq_len, v.seq_len), jnp.float32)
    probe_t = jnp.zeros((t.layers, B, t.heads, tokens.shape[1], tokens.shape[1]),
                        jnp.float32)

    def score(pv, pt):
        img_f, probs_v = encode_image(params, cfg, images, policy=policy,
                                      normalize=True, return_probs=True,
                                      probs_probe=pv)
        txt_f, probs_t = encode_text(params, cfg, tokens, policy=policy,
                                     normalize=True, return_probs=True,
                                     probs_probe=pt)
        logits = jnp.exp(params["logit_scale"]) * img_f @ txt_f.T
        one_hot = jnp.sum(jnp.diag(jnp.diagonal(logits)))  # diagonal pairs
        return one_hot, (probs_v, probs_t)

    (grad_v, grad_t), (probs_v, probs_t) = jax.grad(
        score, argnums=(0, 1), has_aux=True)(probe_v, probe_t)

    R_image = _propagate(probs_v.astype(jnp.float32), grad_v, start_layer)
    R_text = _propagate(probs_t.astype(jnp.float32), grad_t, start_layer_text)
    return R_text, R_image


def image_relevance_map(R_image_row, grid: int, *, out_size: int = 224) -> np.ndarray:
    """R_image[b, 0, 1:] (CLS row over patches) -> [out_size, out_size] in [0,1],
    bilinear-upsampled like reference attention.py:75-99."""
    rel = np.asarray(R_image_row, dtype=np.float32)[1: 1 + grid * grid].reshape(grid, grid)
    rel = jax.image.resize(jnp.asarray(rel), (out_size, out_size), method="bilinear")
    rel = np.asarray(rel)
    lo, hi = rel.min(), rel.max()
    return (rel - lo) / (hi - lo + 1e-8)


def text_relevance_scores(R_text_row, tokens_row, eot_index: int) -> np.ndarray:
    """Relevance of each token w.r.t. the EOT feature position, normalized to [0,1]
    over the real tokens (reference attention.py:101-143 CLS-row normalization)."""
    scores = np.asarray(R_text_row, dtype=np.float32)[eot_index].copy()
    n = int(eot_index) + 1
    s = scores[:n]
    lo, hi = s.min(), s.max()
    out = np.zeros_like(scores)
    out[:n] = (s - lo) / (hi - lo + 1e-8)
    return out


def text_heatmap_per_char(R_text_b, tokens_row, text: str, tokenizer):
    """Per-character relevance for one text (reference attention.py:113-133):
    take the EOT row of R_text over columns 1..EOT-1 (real BPE tokens, SOT and
    EOT excluded), normalize to sum 1, then group BPE-token scores back onto the
    source characters (a char may encode to several BPE tokens; their scores sum).

    Returns list[(char, score)] covering as many chars as have token scores.
    """
    eot = int(np.asarray(tokens_row).argmax())
    row = np.asarray(R_text_b, dtype=np.float32)[eot, 1:eot]
    total = row.sum()
    scores = row / total if total != 0 else row
    out = []
    i = 0
    for ch in text:
        n = len(tokenizer.encode(ch))
        if n == 0:
            out.append((ch, 0.0))
            continue
        if i + n > len(scores):
            break
        out.append((ch, float(scores[i: i + n].sum())))
        i += n
    return out


def render_text_heatmap_html(char_scores, out_path: str, *, title: str = "") -> str:
    """Write the per-token heatmap HTML the reference produces via captum
    (reference attention.py:135-143 visualize_text -> test.html). Green intensity
    encodes positive relevance, red negative — captum's color convention."""
    spans = []
    if char_scores:
        peak = max(abs(s) for _, s in char_scores) or 1.0
    else:
        peak = 1.0
    for ch, s in char_scores:
        a = min(abs(s) / peak, 1.0)
        color = (f"hsla(120, 75%, 50%, {a:.3f})" if s >= 0
                 else f"hsla(0, 75%, 50%, {a:.3f})")
        label = ch.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        spans.append(
            f'<mark style="background-color: {color}; line-height: 1.75">'
            f"{label}</mark>")
    html = ("<html><head><meta charset='utf-8'></head><body>"
            f"<div><b>{title}</b></div>"
            f"<div style='font-size: 20px'>{''.join(spans)}</div>"
            "</body></html>")
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(html)
    return html


def decoder_attention_map(gpt_params, gcfg, prompt_embeds, generated_tokens, *,
                          policy=DEFAULT_POLICY):
    """Per-generated-token last-layer decoder attention — the reference's
    attention_map figure (reference CLIP_prefix_caption/test.py:342-350 collects
    `outputs.attentions[-1][:, -1, -1, :]` each decode step :383-390).

    Computed post-hoc in ONE forward over [prompt ‖ generated] embeddings (causal
    attention makes per-step rows identical to the reference's per-step capture).
    Returns [n_generated, seq_len]: mean-over-heads attention of each generated
    position over everything before it.
    """
    import jax.numpy as jnp

    from construction_clip_tpu.models import gpt2 as gpt2_lib

    tok_emb = gpt2_lib.embed_tokens(gpt_params, generated_tokens, policy=policy)
    embeds = jnp.concatenate([prompt_embeds.astype(tok_emb.dtype), tok_emb], axis=1)
    _, probs = gpt2_lib.gpt2_forward(gpt_params, gcfg, inputs_embeds=embeds,
                                     policy=policy, return_probs=True)
    last = probs[-1]                      # [B, H, T, T]
    t0 = prompt_embeds.shape[1]
    rows = last[:, :, t0 - 1: -1, :].mean(axis=1)  # predicting positions, heads avg
    return np.asarray(rows[0])


def plot_attention_map(attn_rows: np.ndarray, out_path: str, *,
                       token_labels=None) -> None:
    """Heatmap figure for decoder_attention_map output (the reference uses plotly,
    test.py:342-350; matplotlib here)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, max(3, attn_rows.shape[0] / 4)))
    ax.imshow(attn_rows, aspect="auto", cmap="viridis")
    ax.set_xlabel("attended position")
    ax.set_ylabel("generated token")
    if token_labels is not None:
        ax.set_yticks(range(len(token_labels)))
        ax.set_yticklabels(token_labels)
    fig.colorbar(ax.images[0])
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def overlay_heatmap(image_u8: np.ndarray, relevance01: np.ndarray) -> np.ndarray:
    """JET-colormap overlay (reference show_image_relevance, attention.py:89-99).
    image_u8 [H,W,3]; relevance01 [H,W] in [0,1]. Returns uint8 [H,W,3]."""
    try:
        import cv2

        heat = cv2.applyColorMap((relevance01 * 255).astype(np.uint8), cv2.COLORMAP_JET)
        heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    except ImportError:  # pure-numpy JET approximation
        x = relevance01
        heat = np.stack([np.clip(1.5 - np.abs(4 * x - 3), 0, 1),
                         np.clip(1.5 - np.abs(4 * x - 2), 0, 1),
                         np.clip(1.5 - np.abs(4 * x - 1), 0, 1)], axis=-1)
    img = image_u8.astype(np.float32) / 255.0
    out = heat + img
    out = out / out.max()
    return (out * 255).astype(np.uint8)
