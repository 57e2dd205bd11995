import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from swift_readability_spark.pipeline.session import build_session

    spark = build_session(
        app_name="srs-tests", master="local[*]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Small deterministic spans corpus: all 130 fixtures + 20 synthetic
    docs (one mega-doc)."""
    from swift_readability_spark.corpus.synth import build_corpus

    out = tmp_path_factory.mktemp("corpus")
    build_corpus(str(out), n_synth=20, seed=42, include_fixtures=True, mega_every=20)
    return str(out)
