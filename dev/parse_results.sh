#!/bin/bash
# Parse train/inference speed and eval metrics out of a log file.
# Equivalent of the reference dev/parse_results.sh
# (/root/reference/dev/parse_results.sh), adapted to this framework's log
# lines:
#   "Overall training speed: 90 iterations in 44.1s (0.4900 s / it)"
#       (engine/hooks.py IterationTimer.after_train)
#   "Inference: 0.1365 s/img (7.33 img/s)"
#       (evaluation/evaluator.py inference_on_dataset)
#   "copypaste: Task: bbox" / "copypaste: AP,AP50,..." / "copypaste: 1.0,..."
#       (evaluation/testing.py print_csv_format)

LOG="$1"

if [[ -z "$LOG" ]]; then
	echo "Usage: $0 /path/to/log/file"
	exit 1
fi

# training speed (s / it)
trainspeed=$(grep -o 'Overall training speed.*' "$LOG" | tail -n1 \
	| grep -Eo '\([0-9.]+ s / it\)' | grep -o '[0-9.]*')
echo "Training speed: $trainspeed s/it"

# inference speed (s / img); there can be multiple evals in one log
inferencespeed=$(grep -o 'Inference: [0-9.]* s/img' "$LOG" | tail -n1 \
	| grep -o '[0-9.]*')
echo "Inference speed: $inferencespeed s/img"

echo "Easy to copypaste:"
echo "$trainspeed","$inferencespeed"

echo "------------------------------"

echo "Eval results:"
num_tasks=$(grep -o 'copypaste:.*Task.*' "$LOG" | sort -u | wc -l)
# each task emits 3 copypaste lines (task name, metric names, values)
grep -o 'copypaste:.*' "$LOG" | sed 's/^copypaste: //' \
	| tail -n $((num_tasks * 3))
