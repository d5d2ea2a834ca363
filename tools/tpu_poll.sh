#!/bin/bash
# Poll the axon TPU tunnel; touch /tmp/tpu_up.flag when it answers.
# Run detached: bash tools/tpu_poll.sh &
rm -f /tmp/tpu_up.flag
while true; do
  if timeout 45 env PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon \
      python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    touch /tmp/tpu_up.flag
    echo "TPU up at $(date)" >> /tmp/tpu_poll.log
    exit 0
  fi
  echo "down $(date)" >> /tmp/tpu_poll.log
  # this box has ONE cpu — poll sparsely so the jax-import probe doesn't
  # steal cycles from the test suite
  sleep 180
done
