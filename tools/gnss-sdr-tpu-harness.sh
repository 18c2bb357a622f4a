#!/bin/sh
# Restart harness: relaunches the receiver whenever it exits with code 42,
# which the CLI returns after a `reset` telecommand (the same exit-code
# contract as the reference's src/utils/scripts/gnss-sdr-harness.sh /
# control_thread.cc:381).
# usage: ./gnss-sdr-tpu-harness.sh python -m gnss_sdr_tpu -c receiver.conf
echo "$@"
"$@"
while [ $? -eq 42 ]
do
    echo "restarting gnss-sdr-tpu..."
    "$@"
done
