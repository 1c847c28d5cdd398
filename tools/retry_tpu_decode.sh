#!/bin/bash
# Canary until the worker decodes sanely, then land a full TPU beam-3 decode
# of the e2e held-out split as a labeled artifact next to the CPU-decoded one.
cd /root/repo
echo "canary start $(date +%H:%M:%S)"
python -u tools/wait_decode_healthy.py --tries 20 --interval 300 >> /tmp/canary_r5.log 2>&1
rc=$?
echo "canary rc=$rc $(date +%H:%M:%S)"
if [ $rc -ne 0 ]; then echo "never healthy; attempt log at /tmp/canary_r5.log"; exit 1; fi
python -u apps/predict.py \
  --json_path runs/e2e/e2e_test.json --image_root runs/e2e/images \
  --clip_checkpoint runs/e2e/models/clip_latest.npz --arch vit_b_32 \
  --caption_checkpoint runs/e2e/models/clipcap.npz \
  --clip_bpe runs/e2e/assets/clip_bpe_offline.txt.gz \
  --tokenizer runs/e2e/assets/bert_zh_vocab \
  --batch_size 8 --output_dir runs/e2e/output_tpu
rc=$?
echo "predict rc=$rc $(date +%H:%M:%S)"
[ $rc -ne 0 ] && exit 1
python -u apps/score.py runs/e2e/output_tpu/output_log.json > runs/e2e/output_tpu/score.json
echo "DONE $(date +%H:%M:%S)"
