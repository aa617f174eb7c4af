"""Utilities: data pipeline, morphology analysis, configs, metrics."""
