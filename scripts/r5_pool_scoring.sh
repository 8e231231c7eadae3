#!/bin/sh
# Round-5 VERDICT #5 scoring: long-schedule pool-3 --no-mutual production
# recipe endpoint (150 ep), served through every pool lever — vs the
# same-budget single-gen 300-ep row (PARITY long-schedule section).
# Every figure's exact command, per the repo QUALITY rule.
set -x
RD=${1:-/tmp/pool_long_run}
VAL=/tmp/srbench_data360_val
cd /root/repo
python scripts/score_val.py --results-dir "$RD" --val-dir "$VAL" --prefix Training
python scripts/score_val.py --results-dir "$RD" --val-dir "$VAL" --prefix Training --ema
python scripts/score_val.py --results-dir "$RD" --val-dir "$VAL" --prefix Training-best
python scripts/ensemble_eval.py --results-dir "$RD" --val-dir "$VAL" --prefix Training
python scripts/ensemble_eval.py --results-dir "$RD" --val-dir "$VAL" --prefix Training --ema
python scripts/ensemble_eval.py --results-dir "$RD" --val-dir "$VAL" --prefix Training-best
python scripts/robustness_eval.py --results-dir "$RD" --val-dir "$VAL" --prefix Training-best
