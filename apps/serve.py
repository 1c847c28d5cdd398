#!/usr/bin/env python
"""HTTP serving — the `application.py` entry point: POST /predict (multipart image)
-> detection + classification + caption JSON; GET /ping; GET /.
"""

from __future__ import annotations

import argparse

from common import (enable_compilation_cache, load_clip, load_clip_tokenizer,
                    load_hf_tokenizer)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--caption_checkpoint", default=None)
    p.add_argument("--clip_bpe", default=None)
    p.add_argument("--tokenizer", default="ckiplab/gpt2-base-chinese")
    p.add_argument("--arch", default="vit_b_32",
                   choices=["vit_b_32", "vit_b_16", "vit_l_14", "tiny", "tiny_bpe"])
    p.add_argument("--prefix_length", type=int, default=20)
    p.add_argument("--attribute_length", type=int, default=20)
    p.add_argument("--mapping_type", default="mlp")
    p.add_argument("--greedy", action="store_true", help="greedy decode instead of beam")
    p.add_argument("--int8", action="store_true",
                   help="int8 serving: quantize the CLIP image tower and GPT-2 "
                        "weights at startup (half the weight memory; encode +19%%)")
    p.add_argument("--detector_checkpoint", default=None,
                   help="torchvision fasterrcnn .pth (the reference's model_final.pth)")
    p.add_argument("--enable_detector", action="store_true",
                   help="run the JAX Faster R-CNN (random weights without a ckpt)")
    p.add_argument("--detector_image_size", type=int, default=800,
                   help="detector staging square (800 = the reference's "
                        "min-side; 512 = the documented fast config)")
    p.add_argument("--detector_geometry", default="letterbox",
                   choices=["letterbox", "crop"],
                   help="letterbox = no-content-loss (reference transform "
                        "contract); crop = center-crop fast path")
    p.add_argument("--detector_num_classes", type=int, default=7,
                   help="head size incl. background (reference "
                        "application.py:14 builds 7)")
    p.add_argument("--batch_window_ms", type=float, default=0.0,
                   help=">0: coalesce concurrent requests into one device batch")
    p.add_argument("--max_batch", type=int, default=8)
    args = p.parse_args()

    enable_compilation_cache()
    import jax

    from construction_clip_tpu.core.configs import ClipCapConfig, GPT2Config
    from construction_clip_tpu.infer.caption import CaptionPipeline
    from construction_clip_tpu.models.clipcap import init_clipcap
    from construction_clip_tpu.serve.app import PredictService, serve
    from construction_clip_tpu.train.checkpoint import load_params_npz

    clip_params, clip_cfg = load_clip(args.clip_checkpoint, arch=args.arch)
    ccfg = ClipCapConfig(prefix_length=args.prefix_length,
                         attribute_length=args.attribute_length,
                         mapper=args.mapping_type,
                         clip_dim=clip_cfg.text.embed_dim)
    gcfg = GPT2Config() if args.arch != "tiny" else GPT2Config.tiny()
    cap_params = init_clipcap(jax.random.key(0), ccfg, gcfg)
    if args.caption_checkpoint:
        cap_params = load_params_npz(args.caption_checkpoint, cap_params)
    if args.int8:
        from construction_clip_tpu.models.clip.quant import quantize_clip
        from construction_clip_tpu.models.gpt2 import quantize_gpt2

        clip_params = quantize_clip(clip_params)
        cap_params = dict(cap_params, gpt=quantize_gpt2(cap_params["gpt"]))

    pipe = CaptionPipeline(
        clip_params=clip_params, clip_cfg=clip_cfg, cap_params=cap_params,
        ccfg=ccfg, gcfg=gcfg,
        clip_tokenizer=load_clip_tokenizer(args.clip_bpe, expect_vocab=clip_cfg.text.vocab_size if args.clip_checkpoint else None),
        lm_tokenizer=load_hf_tokenizer(args.tokenizer))
    detector = None
    if args.enable_detector or args.detector_checkpoint:
        from construction_clip_tpu.serve.detector import JaxDetector, ThresholdWrapper

        detector = ThresholdWrapper(JaxDetector(
            args.detector_checkpoint, num_classes=args.detector_num_classes,
            image_size=args.detector_image_size,
            geometry=args.detector_geometry))
    serve(PredictService(pipe, detector=detector, use_beam=not args.greedy,
                         batch_window_ms=args.batch_window_ms,
                         max_batch=args.max_batch),
          host=args.host, port=args.port)


if __name__ == "__main__":
    main()
