#!/usr/bin/env bash
# Validate a released reference (torch) checkpoint end-to-end:
#   download -> convert_checkpoint -> vc_decode -> bin/evaluate
#
# This image has NO network egress, so the real run waits for a connected
# environment; `--selftest` rehearses the EXACT same chain in-image by
# saving a random-init reference-format torch checkpoint (the precise
# torch.save dict the reference trainer writes —
# /root/reference/seq2seq_vc/trainers/base.py:85-105: keys model/optimizer/
# scheduler/steps/epochs — including live BatchNorm running statistics,
# which the converters must map) and driving it through the same commands
# against the synthetic corpus.
#
# Published artifacts on huggingface.co/unilight/seq2seq-vc the reference
# recipes actually name (reference egs/*/run.sh):
#   ljspeech/transformer_tts_aept/{checkpoint-50000steps.pkl,config.yml,stats.h5}
#   s3prl-vc-ppg_sxliu/{checkpoint-50000steps.pkl,config.yml,stats.h5}
# No TRAINED arctic vc1/vc2 checkpoint name appears in the reference repo,
# so --hf-prefix must be given explicitly when one is published; this
# script makes no assumption about its name.
#
# Egress-mode usage (arctic vc2 example; build the feature dump first with
# `egs/arctic/vc2/run.sh --stage 0 --stop_stage 2`):
#   scripts/validate_released_ckpt.sh \
#     --hf-prefix <repo-path-of-released-ckpt-dir> \
#     --src-dumpdir egs/arctic/vc2/dump/clb_eval/norm_self \
#     --gt-wavdir  egs/arctic/vc2/downloads/cmu_arctic/cmu_us_slt_arctic/wav \
#     --workdir /tmp/validate_ckpt
# Then compare the printed MCD against the reference README table
# (/root/reference/egs/arctic/vc_urhythmic/README.md: AAS-VC 6.27 dB on the
# 932-utterance training setup).
#
# Selftest (this image):
#   scripts/validate_released_ckpt.sh --selftest
set -euo pipefail

cd "$(dirname "$0")/.."
REPO=$PWD

selftest=0
hf_repo="unilight/seq2seq-vc"
hf_prefix=""
ckpt=""
config=""
stats=""
src_dumpdir=""
dp_input_dir=""
gt_wavdir=""
workdir="/tmp/validate_ckpt"

while [ $# -gt 0 ]; do
  case "$1" in
    --selftest) selftest=1; shift ;;
    --hf-repo) hf_repo=$2; shift 2 ;;
    --hf-prefix) hf_prefix=$2; shift 2 ;;
    --ckpt) ckpt=$2; shift 2 ;;
    --config) config=$2; shift 2 ;;
    --stats) stats=$2; shift 2 ;;
    --src-dumpdir) src_dumpdir=$2; shift 2 ;;
    --dp-input-dir) dp_input_dir=$2; shift 2 ;;
    --gt-wavdir) gt_wavdir=$2; shift 2 ;;
    --workdir) workdir=$2; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

mkdir -p "$workdir"

if [ "$selftest" = 1 ]; then
  echo "=== selftest: build synthetic corpus + features (recipe stages 0-2)"
  (cd egs/synth/vc1 && WORKDIR="$workdir/synthdata" ./run.sh --workdir "$workdir/synthdata" --stage 0 --stop_stage 2)
  src_dumpdir="egs/synth/vc1/$workdir/synthdata/dump/src/norm"
  # run.sh resolves workdir relative to its own directory unless absolute
  [ -d "$workdir/synthdata/dump/src/norm" ] && src_dumpdir="$workdir/synthdata/dump/src/norm"
  dp_input_dir="$src_dumpdir"
  stats="$workdir/synthdata/stats/trg/stats.h5"
  gt_wavdir="$workdir/synthdata/corpus/trg"

  echo "=== selftest: save a reference-format torch checkpoint (trainers/base.py dict)"
  python - "$workdir" <<'PY'
import sys, os
sys.path.insert(0, os.getcwd()); sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
import numpy as np, torch, yaml
from reference_runtime import load_reference
load_reference()
from seq2seq_vc.models.aas_vc import AASVC as RefAASVC
from seq2seq_vc.schedulers.warmup_lr import WarmupLR

workdir = sys.argv[1]
# reference-schema model params (the arctic vc2 aas_vc.melmelmel.v1 shape
# family at synth scale); BN lives in the conformer conv modules AND the
# postnet, so the converted checkpoint must carry running stats for both
ref_params = dict(
    idim=80, odim=80, adim=64, aheads=2, elayers=2, eunits=128,
    dlayers=2, dunits=128, positionwise_layer_type="linear",
    positionwise_conv_kernel_size=1,
    duration_predictor_use_encoder_outputs=False,
    duration_predictor_input_dim=80, duration_predictor_layers=2,
    duration_predictor_chans=64, duration_predictor_kernel_size=3,
    postnet_layers=2, postnet_filts=5, postnet_chans=64, use_masking=True,
    encoder_normalize_before=True, decoder_normalize_before=True,
    encoder_reduction_factor=1, post_encoder_reduction_factor=2,
    decoder_reduction_factor=1, encoder_type="conformer",
    decoder_type="conformer", duration_predictor_type="stochastic",
    stochastic_duration_predictor_flows=2, encoder_input_layer="linear",
    conformer_pos_enc_layer_type="rel_pos",
    conformer_self_attn_layer_type="rel_selfattn",
    use_macaron_style_in_conformer=True, use_cnn_in_conformer=True,
    conformer_enc_kernel_size=7, conformer_dec_kernel_size=7,
    init_type="xavier_uniform",
)
torch.manual_seed(0)
model = RefAASVC(**ref_params)
# make the BatchNorm running stats NON-trivial (a real 50k-step checkpoint
# has them far from init) so the conversion is actually exercised
model.train()
with torch.no_grad():
    for _ in range(3):
        xs = torch.randn(2, 37, 80)
        ys = torch.randn(2, 61, 80)
        ilens = torch.tensor([37, 30])
        model(xs, ilens, ys, torch.tensor([61, 50]), dp_inputs=xs, dp_lengths=ilens)
opt = torch.optim.Adam(model.parameters(), lr=1e-4)
sched = WarmupLR(opt, warmup_steps=4000)
state = {
    "model": model.state_dict(),
    "optimizer": opt.state_dict(),
    "scheduler": sched.state_dict(),
    "steps": 50000,
    "epochs": 100,
}  # exact reference trainer dict (trainers/base.py:85-105)
os.makedirs(os.path.join(workdir, "downloads"), exist_ok=True)
torch.save(state, os.path.join(workdir, "downloads", "checkpoint-50000steps.pkl"))

# the convert/decode config: reference model_params plus this framework's
# norm-type switches (REQUIRED whenever the torch checkpoint carries BN
# running stats — convert_checkpoint errors with that instruction if
# forgotten); feature/vocoder sections as the recipes write them
conf = {
    "sampling_rate": 16000, "fft_size": 1024, "hop_size": 256,
    "num_mels": 80, "fmin": 80, "fmax": 7600,
    "src_feat": "mel", "trg_feat": "mel", "duration_predictor_feat": "mel",
    "model_type": "AASVC",
    "model_params": {
        **ref_params,
        "postnet_norm_type": "batch_norm",
        "conformer_conv_norm_type": "batch_norm",
    },
    "inference": {},
}
with open(os.path.join(workdir, "downloads", "config.yml"), "w") as f:
    yaml.safe_dump(conf, f)
print("wrote", os.path.join(workdir, "downloads", "checkpoint-50000steps.pkl"))
PY
  ckpt="$workdir/downloads/checkpoint-50000steps.pkl"
  config="$workdir/downloads/config.yml"
else
  if [ -z "$ckpt" ] && [ -n "$hf_prefix" ]; then
    echo "=== download released checkpoint from $hf_repo / $hf_prefix"
    python utils/hf_download.py --repo_id "$hf_repo" --outdir "$workdir/downloads" \
      --filename "$hf_prefix/checkpoint-50000steps.pkl"
    python utils/hf_download.py --repo_id "$hf_repo" --outdir "$workdir/downloads" \
      --filename "$hf_prefix/config.yml"
    python utils/hf_download.py --repo_id "$hf_repo" --outdir "$workdir/downloads" \
      --filename "$hf_prefix/stats.h5"
    ckpt="$workdir/downloads/$hf_prefix/checkpoint-50000steps.pkl"
    config="$workdir/downloads/$hf_prefix/config.yml"
    stats=${stats:-"$workdir/downloads/$hf_prefix/stats.h5"}
  fi
  [ -n "$ckpt" ] || { echo "need --ckpt or --hf-prefix" >&2; exit 2; }
  [ -n "$config" ] || { echo "need --config (reference exp config.yml)" >&2; exit 2; }
  [ -n "$src_dumpdir" ] || { echo "need --src-dumpdir (normalized features)" >&2; exit 2; }
fi

echo "=== convert: reference torch dict -> native msgpack checkpoint"
mkdir -p "$workdir/converted"
python -m seq2seq_vc_tpu.bin.convert_checkpoint \
  --torch-checkpoint "$ckpt" \
  --config "$config" \
  --outpath "$workdir/converted/checkpoint-50000steps.ckpt"
cp "$config" "$workdir/converted/config.yml"

echo "=== decode the evaluation set with the converted checkpoint"
python -m seq2seq_vc_tpu.bin.vc_decode \
  --dumpdir "$src_dumpdir" \
  ${dp_input_dir:+--dp-input-dir "$dp_input_dir"} \
  --checkpoint "$workdir/converted/checkpoint-50000steps.ckpt" \
  --outdir "$workdir/results" \
  --trg-stats "$stats"

echo "=== evaluate (MCD/F0/DDUR; add --transcription/--asr-model for CER/WER)"
python -m seq2seq_vc_tpu.bin.evaluate \
  --wavdir "$workdir/results/wav" \
  --gt-wavdir "$gt_wavdir" \
  --f0min 100 --f0max 400 --fs 16000 \
  --out "$workdir/results/evaluation.csv"

echo "=== done: $workdir/results/evaluation.csv"
