"""ML residual classifier — capability parity with the reference's TF-IDF +
RandomForest path (SURVEY.md §2.9 M1-M3).

Reference: Porter-stemmed owner strings (`Classify_Unknowns_opt.py:110-117`),
sklearn TfidfVectorizer (`:531-533`), pickled 20-tree forest applied in
1000-row chunks (`:539-548`, seed 0, 80/20 split per the training notebook).

Rebuild: a pyspark.ml Pipeline — RegexTokenizer -> (stemming pandas UDF) ->
HashingTF -> IDF -> RandomForestClassifier(numTrees=20, seed=0). Training is
distributed; inference is one model.transform (no chunk loop — Arrow batches
and executor parallelism replace it, SURVEY.md §4 X2).

nltk's Porter stemmer is not in this container, so stemming uses a compact
clean-room Porter-style suffix stripper (deterministic, vectorized); the
pipeline shape and the model contract match the reference.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import IDF, CountVectorizer, RegexTokenizer, StringIndexer
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_STEP1 = [("sses", "ss"), ("ies", "i"), ("ss", "ss"), ("s", "")]
_SUFFIXES = [
    "ational", "tional", "iveness", "fulness", "ousness", "ization", "biliti",
    "entli", "ousli", "alism", "aliti", "ation", "ement", "ments", "ence",
    "ance", "able", "ible", "ment", "ent", "ism", "ate", "iti", "ous", "ive",
    "ize", "ing", "ed", "er", "ly",
]


def porter_ish_stem(word: str) -> str:
    """Compact Porter-style stemmer: step-1 plural folding + one longest
    suffix strip with a 3-char stem floor. Deterministic and total."""
    w = word
    for suf, rep in _STEP1:
        if w.endswith(suf):
            if len(w) - len(suf) + len(rep) >= 2:
                w = w[: len(w) - len(suf)] + rep
            break
    for suf in _SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: len(w) - len(suf)]
            break
    return w


def preprocess_simple_owner_py(s: str) -> str:
    """Mirror of `Classify_Unknowns_opt.py:110-114`: lower, strip
    non-word/space chars, stem each token."""
    s = s.lower()
    s = re.sub(r"[^\w\s]", "", s)
    return " ".join(porter_ish_stem(t) for t in s.split())


@pandas_udf(StringType())
def _stem_udf(col: pd.Series) -> pd.Series:
    return col.map(lambda v: None if v is None else preprocess_simple_owner_py(v))


def stemmed(col: Column | str) -> Column:
    return _stem_udf(F.col(col) if isinstance(col, str) else col)


def build_classifier_pipeline(
    text_col: str = "simple_owners_stemmed",
    label_col: str = "label",
    num_trees: int = 20,
    seed: int = 0,
    vocab_size: int = 1 << 16,
) -> Pipeline:
    tokenizer = RegexTokenizer(
        inputCol=text_col, outputCol="_tokens", pattern=r"\s+", minTokenLength=1
    )
    # CountVectorizer (fitted, compact vocabulary) + IDF mirrors the
    # reference's TfidfVectorizer (`Classify_Unknowns_opt.py:531-533`) —
    # a compact feature space also keeps the forest's sqrt-feature sampling
    # effective, unlike a sparse 2^14 hashing space.
    tf = CountVectorizer(inputCol="_tokens", outputCol="_tf", vocabSize=vocab_size)
    idf = IDF(inputCol="_tf", outputCol="features")
    rf = RandomForestClassifier(
        featuresCol="features", labelCol=label_col, numTrees=num_trees, seed=seed
    )
    return Pipeline(stages=[tokenizer, tf, idf, rf])


def train_residual_classifier(
    train: DataFrame,
    owner_col: str = "simple_owners",
    class_col: str = "own_type",
    seed: int = 0,
) -> tuple[PipelineModel, StringIndexer, dict]:
    """Train on rule-matched rows; returns (model, label mapping, metrics).

    Mirrors the reference's 80/20 holdout (`random_state=0`, notebook cell 19).
    """
    prepared = train.withColumn("_stemmed", stemmed(owner_col)).withColumn(
        "simple_owners_stemmed", F.col("_stemmed")
    )
    indexer = StringIndexer(inputCol=class_col, outputCol="label", handleInvalid="skip")
    idx_model = indexer.fit(prepared)
    prepared = idx_model.transform(prepared)
    tr, te = prepared.randomSplit([0.8, 0.2], seed=seed)
    model = build_classifier_pipeline().fit(tr)
    pred = model.transform(te)
    n = pred.count()
    correct = pred.filter(F.col("prediction") == F.col("label")).count()
    metrics = {"holdout_n": n, "holdout_accuracy": round(correct / n, 4) if n else None}
    labels = idx_model.labelsArray[0]
    return model, labels, metrics


def predict_residual(
    model: PipelineModel,
    labels: list[str],
    df: DataFrame,
    owner_col: str = "simple_owners",
    out_col: str = "own_type_pred",
) -> DataFrame:
    prepared = df.withColumn("simple_owners_stemmed", stemmed(owner_col))
    pred = model.transform(prepared)
    mapping = F.array(*[F.lit(x) for x in labels])
    return pred.withColumn(
        out_col,
        F.element_at(mapping, F.col("prediction").cast("int") + 1).cast("int"),
    ).drop("_tokens", "_tf", "features", "rawPrediction", "probability", "prediction",
           "simple_owners_stemmed")
