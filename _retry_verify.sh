#!/bin/bash
cd /root/repo
for i in $(seq 1 40); do
  echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> /tmp/verify_retry.log
  python -u _drive_verify_r3c.py >> /tmp/verify_retry.log 2>&1
  if grep -q VERIFY_OK /tmp/verify_retry.log; then
    echo "=== SUCCESS $(date -u +%H:%M:%S) ===" >> /tmp/verify_retry.log
    exit 0
  fi
  sleep 60
done
echo "=== GAVE UP ===" >> /tmp/verify_retry.log
