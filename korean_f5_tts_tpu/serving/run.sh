#!/usr/bin/env bash
# Serving deploy pipeline (role parity with reference runtime/triton_trtllm/run.sh
# 9-stage download->convert->build->serve->bench flow, minus engine builds —
# XLA compiles at startup).
#
# usage: run.sh <stage> [stop_stage]
#   0: convert a torch checkpoint to the native .npz pytree
#   1: generate Korean vocab files
#   2: warm-compile the sampler shapes (first compile is slow on TPU)
#   3: start the HTTP server
#   4: start the gRPC server
#   5: run the offline RTF benchmark
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-5}

CKPT_TORCH=${CKPT_TORCH:-ckpts/F5TTS_v1_Base/model_1250000.safetensors}
CKPT_NPZ=${CKPT_NPZ:-ckpts/F5TTS_v1_Base/model_1250000.npz}
VOCAB=${VOCAB:-data/vocabs/vocab_kor_allophone.txt}
MODEL=${MODEL:-F5TTS_v1_Base}
NFE=${NFE:-16}

run() { echo "+ $*"; "$@"; }

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ] && [ -f "$CKPT_TORCH" ]; then
  run python - <<PY
from korean_f5_tts_tpu.config import preset_model_config
from korean_f5_tts_tpu.infer.model import load_checkpoint_into_pytree
from korean_f5_tts_tpu.train.checkpoint import save_checkpoint
cfg = preset_model_config("$MODEL")
params = load_checkpoint_into_pytree("$CKPT_TORCH", cfg.arch, cfg.backbone)
save_checkpoint("$CKPT_NPZ", params, update=0)
print("converted -> $CKPT_NPZ")
PY
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  run python -m korean_f5_tts_tpu.scripts.generate_korean_vocab --out_dir data/vocabs
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  run python -m korean_f5_tts_tpu.serving.benchmark --model "$MODEL" --nfe_step "$NFE" --n_items 1
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  run f5-tts_server --model "$MODEL" ${CKPT_NPZ:+--ckpt_file "$CKPT_NPZ"} --nfe_step "$NFE" &
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  run f5-tts_grpc-server --model "$MODEL" ${CKPT_NPZ:+--ckpt_file "$CKPT_NPZ"} --nfe_step "$NFE" &
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  run python -m korean_f5_tts_tpu.serving.benchmark --model "$MODEL" --nfe_step "$NFE"
fi
