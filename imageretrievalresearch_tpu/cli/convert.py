"""Checkpoint conversion CLI: torch/Lightning ckpt <-> this framework.

Forward (default, ``--to orbax``): converts the reference's published
checkpoints (checkpoints/checkpoints_path.txt) — or any timm-naming torch
state dict for a supported family — into this framework's native orbax
format:

    python -m imageretrievalresearch_tpu.cli.convert \
        --checkpoint epoch=22-...ckpt --model_name efficientnet_b3a \
        --num_classes 125 --out converted/effb3a

Reverse (``--to torch``): exports a checkpoint (orbax dir — including a
Trainer run directory — or torch) back to a timm-naming torch state dict,
so a model trained here can be loaded by the reference's torch tooling
(inference/inference.py:114-124):

    python -m imageretrievalresearch_tpu.cli.convert \
        --checkpoint saved_models/run1 --model_name efficientnet_b3a \
        --num_classes 125 --to torch --lightning_out --out exported.ckpt
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="torch -> orbax conversion")
    p.add_argument("--checkpoint", required=True,
                   help="torch/Lightning checkpoint path")
    p.add_argument("--model_name", required=True)
    p.add_argument("--num_classes", type=int, default=125)
    p.add_argument("--out", required=True,
                   help="output path: orbax directory (--to orbax) or "
                        "torch checkpoint file (--to torch)")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--conv_input", action="store_true")
    p.add_argument("--not_lightning", action="store_true",
                   help="plain torch state dict (no 'model.' prefix strip)")
    p.add_argument("--lenient", action="store_true",
                   help="allow missing/unused keys")
    p.add_argument("--to", choices=("orbax", "torch"), default="orbax",
                   help="output format: orbax variables dir (default) or a "
                        "timm-naming torch state dict (.pth/.ckpt)")
    p.add_argument("--lightning_out", action="store_true",
                   help="with --to torch: wrap as a Lightning-style ckpt "
                        "('model.'-prefixed keys inside a state_dict "
                        "payload, the published-checkpoint layout)")
    return p


def main() -> None:
    parser = build_parser()
    args = parser.parse_args()
    if args.lightning_out and args.to != "torch":
        parser.error("--lightning_out requires --to torch (the default "
                     "--to orbax output has no Lightning wrapping)")
    import os

    import orbax.checkpoint as ocp

    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.models.convert import load_checkpoint

    backbone = create_model(args.model_name, num_classes=args.num_classes,
                            conv_input=args.conv_input)
    variables = load_checkpoint(
        args.checkpoint, backbone,
        sample_shape=(1, args.image_size, args.image_size, 3),
        from_pytorch_lightning=not args.not_lightning,
        strict=not args.lenient)
    if args.to == "torch":
        import torch

        from imageretrievalresearch_tpu.models.convert import (
            export_torch_state_dict,
        )

        sd = export_torch_state_dict(backbone, variables,
                                     lightning=args.lightning_out,
                                     strict=not args.lenient)
        payload = {"state_dict": sd} if args.lightning_out else sd
        torch.save(payload, args.out)
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(args.out), variables)
        ckptr.wait_until_finished()
    print(f"Converted {args.checkpoint} -> {args.out}")


if __name__ == "__main__":
    main()
