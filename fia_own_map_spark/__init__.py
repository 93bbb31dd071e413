"""fia_own_map_spark — a PySpark-native entity-resolution (record-linkage) engine.

Brand-new rebuild of the capabilities of familyforestresearchcenter/FIA_OWN_MAP
(reference at /root/reference, cited by file:line throughout) as a three-stage
Spark job over web-scale page tables:

    stage 0  extract   html -> text (byte-identical per url)
    stage 1  block     normalize -> token combos -> double-metaphone/soundex keys
                       -> salted blocking-key edges (skew-bounded)
    stage 2  score     candidate pairs -> vectorized Jaro-Winkler / Levenshtein /
                       token-set-Jaccard -> thresholded match edges
    stage 3  cluster   large-star/small-star connected components -> stable
                       min-id cluster labels -> address refinement

Everything is declarative pyspark.sql (Catalyst-optimized); Python appears only
in Arrow-batched pandas UDFs (phonetics, Jaro-Winkler, NFKD folding).
"""

__version__ = "0.1.0"
