from __future__ import annotations

import pytest

from kgsum_spark.session import build_session
from kgsum_spark.synth import generate_corpus
from kgsum_spark import schemas


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="kgsum_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(n_convs=200, seed=42)


@pytest.fixture(scope="session")
def transcripts_df(spark, corpus):
    return spark.createDataFrame(corpus.transcripts, schema=schemas.TRANSCRIPTS).cache()
