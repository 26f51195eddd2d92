"""CLI entry points with the reference's argparse surface.

``python -m imageretrievalresearch_tpu.cli.train ...`` accepts the same flags
as reference train/train.py (SURVEY.md §5 config row / BASELINE.json parity
requirement); likewise cli.inference for inference/inference.py and
cli.data_split for the dataset-preparation entry.
"""
