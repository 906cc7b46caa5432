"""Shared pure-numpy scoring core — used by both Spark UDFs and the oracle."""
