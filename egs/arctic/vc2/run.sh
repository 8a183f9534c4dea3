#!/usr/bin/env bash
# CMU ARCTIC clb->slt AAS-VC (NAR conformer + alignment search) recipe,
# mirroring the reference egs/arctic/vc2/run.sh stages. Shares data prep
# with ../vc1 (run that recipe's stages 0-2 first, or point dumpdir there).
set -euo pipefail

stage=1
stop_stage=100
n_jobs=8
conf=conf/aas_vc.melmelmel.v1.yaml
srcspk=clb
trgspk=slt
db_root=../vc1/downloads
dumpdir=../vc1/dump
expdir=exp
tag=aas_vc.melmelmel.v1

repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"

cd "$(dirname "$0")"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "=== stage 3: training (expects vc1 stages 0-2 dumps at $dumpdir)"
  python3 -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$dumpdir/$srcspk/train/norm" \
    --src-dev-dumpdir "$dumpdir/$srcspk/dev/norm" \
    --trg-train-dumpdir "$dumpdir/$trgspk/train/norm" \
    --trg-dev-dumpdir "$dumpdir/$trgspk/dev/norm" \
    --train-dp-input-dir "$dumpdir/$srcspk/train/norm" \
    --dev-dp-input-dir "$dumpdir/$srcspk/dev/norm" \
    --trg-stats "$dumpdir/$trgspk/stats/stats.h5" \
    --outdir "$expdir/${srcspk}_${trgspk}_${tag}" --config "$conf"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: decoding"
  ckpt=$(ls -dt "$expdir/${srcspk}_${trgspk}_${tag}"/checkpoint-*steps.ckpt | head -1)
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.vc_decode \
      --dumpdir "$dumpdir/$srcspk/$set/norm" \
      --dp-input-dir "$dumpdir/$srcspk/$set/norm" \
      --checkpoint "$ckpt" \
      --outdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set" \
      --trg-stats "$dumpdir/$trgspk/stats/stats.h5"
  done
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  echo "=== stage 5: objective evaluation"
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.evaluate \
      --wavdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set/wav" \
      --gt-wavdir "$db_root/cmu_us_${trgspk}_arctic/wav" \
      --f0-yaml conf/f0.yaml --spk "$trgspk" --n-jobs "$n_jobs"
  done
fi

# ------------------------- FS2-VC path (conf/fs2_vc.melmelmel.v1.yaml) ----
# requires a trained AR teacher (e.g. ../vc1 VTN exp) whose teacher-forcing
# decode exports per-utterance durations, matching the reference's FS2-VC
# workflow (train_duration_dir / dev_duration_dir).
teacher_expdir=${teacher_expdir:-../vc1/exp/${srcspk}_${trgspk}_vtn.v1}

if [ "$stage" -le 6 ] && [ "$stop_stage" -ge 6 ]; then
  echo "=== stage 6: teacher-forcing decode -> durations (teacher: $teacher_expdir)"
  ckpt=$(ls -dt "$teacher_expdir"/checkpoint-*steps.ckpt | head -1)
  for set in train dev; do
    python3 -m seq2seq_vc_tpu.bin.vc_decode \
      --dumpdir "$dumpdir/$srcspk/$set/norm" \
      --trg-dumpdir "$dumpdir/$trgspk/$set/norm" \
      --use-teacher-forcing \
      --checkpoint "$ckpt" \
      --outdir "$expdir/${srcspk}_${trgspk}_teacher/results_tf/$set" \
      --trg-stats "$dumpdir/$trgspk/stats/stats.h5"
  done
fi

if [ "$stage" -le 7 ] && [ "$stop_stage" -ge 7 ]; then
  echo "=== stage 7: FastSpeech-VC training on teacher durations"
  python3 -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$dumpdir/$srcspk/train/norm" \
    --src-dev-dumpdir "$dumpdir/$srcspk/dev/norm" \
    --trg-train-dumpdir "$dumpdir/$trgspk/train/norm" \
    --trg-dev-dumpdir "$dumpdir/$trgspk/dev/norm" \
    --train-duration-dir "$expdir/${srcspk}_${trgspk}_teacher/results_tf/train/durations" \
    --dev-duration-dir "$expdir/${srcspk}_${trgspk}_teacher/results_tf/dev/durations" \
    --trg-stats "$dumpdir/$trgspk/stats/stats.h5" \
    --outdir "$expdir/${srcspk}_${trgspk}_fs2_vc.melmelmel.v1" \
    --config conf/fs2_vc.melmelmel.v1.yaml
fi

echo "=== arctic vc2 recipe done"
