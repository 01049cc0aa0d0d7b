#!/bin/bash
# Sequential TPU job queue: consumes shell commands line-by-line from
# log/tpu_queue.txt (append anytime), one at a time, with the axon
# inter-client cooldown between jobs. Waits for PID $1 (if given) first.
cd /root/repo || exit 1
Q=log/tpu_queue.txt
IDX=log/tpu_queue.idx
touch "$Q"; [ -f "$IDX" ] || echo 0 > "$IDX"
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 100
fi
while true; do
  n=$(cat "$IDX")
  total=$(grep -c "" "$Q")  # counts a final line even without trailing newline
  if [ "$n" -ge "$total" ]; then
    sleep 30
    continue
  fi
  cmd=$(sed -n "$((n + 1))p" "$Q")
  echo "[queue $(date +%H:%M:%S)] START: $cmd" >> log/tpu_queue.log
  bash -c "$cmd" >> log/tpu_queue.log 2>&1
  echo "[queue $(date +%H:%M:%S)] DONE rc=$?: $cmd" >> log/tpu_queue.log
  echo $((n + 1)) > "$IDX"
  sleep 100
done
