#!/bin/bash
# Log host_probe to BENCH/host_weather_r6.jsonl every 8 min for window picking.
cd /root/repo
for i in $(seq 1 60); do
  python3 -c "
import sys, json, time; sys.path.insert(0,'.')
from bench import host_probe
p = host_probe(); p['t'] = time.strftime('%H:%M:%S')
print(json.dumps(p))
" >> BENCH/host_weather_r6.jsonl 2>/dev/null
  sleep 420
done
