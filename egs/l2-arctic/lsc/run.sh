#!/usr/bin/env bash
# L2-ARCTIC foreign accent conversion — latent space conversion (LSC):
# convert PPG latents (s3prl ppg_sxliu upstream) with a TTS-pretrained VTN,
# resynthesize through the two-stage s3prl-vc downstream + vocoder.
# Staged like the reference egs/l2-arctic/lsc/run.sh.
#
# GATING: PPG extraction needs the external s3prl upstream. Provide either
# precomputed PPG dumps (HDF5 <utt>.h5:ppg_sxliu under the raw dirs) or a
# --ppg_extract_cmd that fills them; stage 1 fails with a clear message
# otherwise. Every other stage is fully implemented.
set -euo pipefail

stage=0
stop_stage=100
n_jobs=8
conf=conf/vtn.tts_pt.v1.ppg_sxliu.yaml
arctic_db_root=../../arctic/vc1/downloads
db_root=downloads/l2arctic        # L2-ARCTIC corpus root (<spk>/wav/*.wav)
dumpdir=dump
expdir=exp
tag=vtn.tts_pt.v1.ppg_sxliu
srcspk=TXHC                       # L2 (accented) speaker
trgspk=bdl                        # native reference speaker
num_train=1032
feat=ppg_sxliu
ppg_upstream_ckpt=
ppg_featurizer_ckpt=
ppg_extract_cmd=""                # external hook: cmd <wav.scp> <outdir>
pretrained_model_checkpoint=downloads/ljspeech_transformer_tts_aept/checkpoint-50000steps.ckpt

repo_root=$(cd "$(dirname "$0")/../../.." && pwd)
. "$repo_root/utils/parse_options.sh"

cd "$(dirname "$0")"
export PYTHONPATH="$repo_root:${PYTHONPATH:-}"

if [ "$stage" -le -1 ] && [ "$stop_stage" -ge -1 ]; then
  echo "=== stage -1: download"
  ../../arctic/vc1/local/data_download.sh "$arctic_db_root" "$trgspk"
  echo "L2-ARCTIC itself requires registration: https://psi.engr.tamu.edu/l2-arctic-corpus/"
  echo "Place it under $db_root/<spk>/wav. The s3prl-vc PPG models"
  echo "(unilight/accent-conversion-2023 on HuggingFace) are needed for stage 1."
fi

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "=== stage 0: data preparation"
  ../../arctic/vc1/local/data_prep.sh --num_train "$num_train" \
    --num_dev 50 --num_eval 50 \
    "$arctic_db_root/cmu_us_${trgspk}_arctic" "$trgspk" data
  ../cascade/local/data_prep.sh --num_train "$num_train" \
    --num_dev 50 --num_eval 50 "$db_root/$srcspk" "$srcspk" data
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "=== stage 1: PPG (upstream) feature extraction"
  for spk in $srcspk $trgspk; do
    for set in train dev eval; do
      raw="$dumpdir/$spk/$set/raw"
      if ls "$raw"/*.h5 >/dev/null 2>&1; then
        echo "$raw already has dumps, skipping"
      elif [ -n "$ppg_extract_cmd" ]; then
        mkdir -p "$raw"
        $ppg_extract_cmd "data/$spk/${set}_wav.scp" "$raw"
      elif [ -n "$ppg_upstream_ckpt" ] && [ -n "$ppg_featurizer_ckpt" ]; then
        # native extraction (encoders/ppg.py): conformer upstream +
        # s3prl featurizer, both from local torch checkpoints
        mkdir -p "$raw"
        python3 -m seq2seq_vc_tpu.bin.preprocess \
          --wav-scp "data/$spk/${set}_wav.scp" --dumpdir "$raw" \
          --config <(python3 - <<PYEOF
import yaml, sys
conf = yaml.safe_load(open("$conf"))
conf["feat_list"] = {"mel": {}, "ppg_sxliu": {
    "checkpoint": "$ppg_featurizer_ckpt",
    "upstream_checkpoint": "$ppg_upstream_ckpt"}}
sys.stdout.write(yaml.safe_dump(conf))
PYEOF
)
      else
        echo "PPG extraction needs checkpoints: pass --ppg_upstream_ckpt and"
        echo "--ppg_featurizer_ckpt (native extractor, encoders/ppg.py), or"
        echo "precompute <utt>.h5:$feat dumps into $raw, or pass"
        echo "--ppg_extract_cmd 'your-extractor'."
        exit 1
      fi
    done
  done
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "=== stage 2: statistics + normalization ($feat)"
  for spk in $srcspk $trgspk; do
    python3 -m seq2seq_vc_tpu.bin.compute_statistics \
      --rootdir "$dumpdir/$spk/train/raw" --config "$conf" \
      --dumpdir "$dumpdir/$spk/stats" --feat_type "$feat"
    for set in train dev eval; do
      python3 -m seq2seq_vc_tpu.bin.normalize \
        --rootdir "$dumpdir/$spk/$set/raw" \
        --dumpdir "$dumpdir/$spk/$set/norm" \
        --stats "$dumpdir/$spk/stats/stats.h5" --feat_type "$feat"
    done
  done
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "=== stage 3: VTN training on PPG latents (TTS-AEPT init)"
  extra=()
  [ -e "$pretrained_model_checkpoint" ] && extra+=(--init-checkpoint "$pretrained_model_checkpoint")
  python3 -m seq2seq_vc_tpu.bin.vc_train \
    --src-train-dumpdir "$dumpdir/$srcspk/train/norm" \
    --src-dev-dumpdir "$dumpdir/$srcspk/dev/norm" \
    --trg-train-dumpdir "$dumpdir/$trgspk/train/norm" \
    --trg-dev-dumpdir "$dumpdir/$trgspk/dev/norm" \
    --trg-stats "$dumpdir/$trgspk/stats/stats.h5" \
    --src-feat-type "$feat" --trg-feat-type "$feat" \
    --outdir "$expdir/${srcspk}_${trgspk}_${tag}" --config "$conf" "${extra[@]}"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "=== stage 4: decoding (latent->latent->wav via s3prl_feat2wav)"
  ckpt=$(ls -dt "$expdir/${srcspk}_${trgspk}_${tag}"/checkpoint-*steps.ckpt | head -1)
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.vc_decode \
      --dumpdir "$dumpdir/$srcspk/$set/norm" \
      --checkpoint "$ckpt" \
      --feat-type "$feat" \
      --outdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set" \
      --trg-stats "$dumpdir/$trgspk/stats/stats.h5"
  done
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  echo "=== stage 5: objective evaluation"
  for set in dev eval; do
    python3 -m seq2seq_vc_tpu.bin.evaluate \
      --wavdir "$expdir/${srcspk}_${trgspk}_${tag}/results/$set/wav" \
      --gt-wavdir "$arctic_db_root/cmu_us_${trgspk}_arctic/wav" \
      --f0-yaml conf/f0.yaml --spk "$trgspk" --n-jobs "$n_jobs"
  done
fi

echo "=== l2-arctic lsc recipe done"
