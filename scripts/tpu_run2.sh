#!/bin/bash
# The round-2 watchdog (scripts/tpu_watchdog.sh, still running from a
# prior session) fires this path on TPU grant; round 3 redirects it to
# the current campaign.
exec bash /root/repo/scripts/tpu_run3.sh
