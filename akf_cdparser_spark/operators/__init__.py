"""Spark operators: the extraction kernel lifted onto DataFrames."""
