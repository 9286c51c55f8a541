"""Convert a torch Vocos checkpoint to the native .npz pytree.

Counterpart of the reference's vocoder export chain
(`runtime/triton_trtllm/scripts/export_vocoder_to_onnx.py` + trt plan build):
here the target is a param pytree consumed by `api.load_vocoder(is_local=True,
local_path=...)` — the ISTFT head needs no export, it is in-graph.
"""

from __future__ import annotations

import argparse

import numpy as np


def convert(in_path: str, out_path: str, num_layers: int = 8) -> None:
    from korean_f5_tts_tpu.train.checkpoint import flatten_tree
    from korean_f5_tts_tpu.utils.torch_ckpt import convert_vocos_state_dict, load_torch_checkpoint

    sd = load_torch_checkpoint(in_path)
    params = convert_vocos_state_dict(sd, num_layers=num_layers)
    np.savez(out_path, **flatten_tree(params))
    print(f"{out_path}: converted vocos checkpoint ({num_layers} layers)")


def main(argv=None):
    p = argparse.ArgumentParser(prog="f5-tts_convert-vocoder")
    p.add_argument("--input", required=True, help="torch .bin/.pt/.safetensors")
    p.add_argument("--output", required=True, help="native .npz path")
    p.add_argument("--num_layers", type=int, default=8)
    args = p.parse_args(argv)
    convert(args.input, args.output, args.num_layers)


if __name__ == "__main__":
    main()
