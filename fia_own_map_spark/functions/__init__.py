"""Scalar / vectorized function library (SURVEY.md §2.8).

Everything expressible with built-in pyspark.sql.functions stays JVM-side;
Python appears only in Arrow-batched pandas UDFs (double metaphone,
Jaro-Winkler, NFKD folding) — never row-at-a-time.
"""
