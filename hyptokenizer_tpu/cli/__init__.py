"""CLI entry points (L6). Run as ``python -m hyptokenizer_tpu.cli.<name>``.

Flag surface mirrors the reference's typer scripts (one flag per
hyperparameter, same names/defaults) using argparse (typer is not a baked-in
dependency here).
"""
