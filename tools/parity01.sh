#!/bin/sh
# Driver-scale (sf0.01) oracle parity for specific entries — run this
# for every NEW or CHANGED declared query before committing: ties and
# fp-order divergence often only appear above the sf0.001 smoke scale
# (VERDICT r1 next-7; the driver compares at sf0.01).
#
#   tools/parity01.sh name_a name_b ...     # named entries
#   tools/parity01.sh                       # full sweep (~2 min)
set -e
cd "$(dirname "$0")/.."
if [ $# -gt 0 ]; then
  expr=""
  for n in "$@"; do
    expr="${expr:+$expr or }$n"
  done
  SPARK_GRAFT_PARITY_SFDIR=/root/testdata/sf0.01 \
    python -m pytest tests/test_oracle_parity.py -q -k "$expr"
else
  SPARK_GRAFT_PARITY_SFDIR=/root/testdata/sf0.01 \
    python -m pytest tests/test_oracle_parity.py -q
fi
