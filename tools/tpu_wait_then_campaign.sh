#!/bin/bash
# Poll until the axon TPU tunnel answers, then run the 3-scene 20k
# parity campaign (tools/parity_campaign.sh). Used when the tunnel is
# down at session start: the campaign self-launches the moment the
# chip is reachable.
set -u
cd /root/repo
LOG=${LOG:-/tmp/parity/tunnel_wait.log}
mkdir -p "$(dirname "$LOG")" /tmp/parity
while :; do
    if timeout 300 python - >>"$LOG" 2>&1 <<'PY'
import jax
d = jax.devices()
assert any(x.platform == "tpu" for x in d), d
print("tpu up:", d, flush=True)
PY
    then
        echo "[wait] TPU reachable, starting campaign $(date)" | tee -a "$LOG"
        break
    fi
    echo "[wait] tunnel still down $(date)" >> "$LOG"
    sleep 60
done
bash tools/parity_campaign.sh >> /tmp/parity/campaign.log 2>&1
echo "CAMPAIGN_EXIT=$?" >> /tmp/parity/campaign.log
