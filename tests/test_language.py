"""Trigram language classifier (L1 default): accuracy on held-out real
sentences + fallback behavior. The parquet fixtures carry synthetic
same-vocabulary text for every lang label, so genuine classification
accuracy is asserted here on real prose instead (seed-disjoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.functions.language import with_lang_id

# none of these sentences appear in lang_trigrams._SEEDS
HELD_OUT = [
    ("en", "My sister finished reading that wonderful book about the "
           "history of science while waiting for the evening train."),
    ("en", "Please remember to bring your umbrella because the weather "
           "report said it would rain for most of the afternoon."),
    ("es", "Mi hermana termino de leer ese libro maravilloso sobre la "
           "historia de la ciencia mientras esperaba el tren de la noche."),
    ("es", "Recuerda traer tu paraguas porque el pronostico dijo que "
           "iba a llover durante casi toda la tarde."),
    ("fr", "Ma soeur a fini de lire ce livre merveilleux sur lhistoire "
           "des sciences en attendant le train du soir."),
    ("fr", "Noublie pas dapporter ton parapluie parce que la meteo a "
           "annonce de la pluie pour presque tout lapres midi."),
    ("de", "Meine schwester hat dieses wunderbare buch ueber die "
           "geschichte der wissenschaft gelesen waehrend sie auf den "
           "abendzug wartete."),
    ("de", "Bitte denk daran deinen regenschirm mitzubringen weil der "
           "wetterbericht fuer den nachmittag regen angekuendigt hat."),
    ("zh", "这家餐厅的菜非常好吃服务也很周到我们下周还会再来"),
]


def test_trigram_classifier_accuracy(spark):
    df = spark.createDataFrame(HELD_OUT, ["expected", "text"])
    out = with_lang_id(df, "text").collect()
    wrong = [
        (r["expected"], r["language"]) for r in out
        if r["language"] != r["expected"]
    ]
    assert not wrong, wrong
    for r in out:
        assert 0.0 <= r["language_confidence"] <= 1.0


def test_trigram_zero_score_falls_back_to_marker(spark):
    rows = [("1234 5678 !!!",), ("",), (None,)]
    df = spark.createDataFrame(rows, ["text"])
    out = with_lang_id(df, "text").collect()
    for r in out:
        assert r["language"] == "unknown"
        assert r["language_confidence"] == 0.0


def test_marker_method_still_available(spark):
    df = spark.createDataFrame(
        [("the food and the service was the best for the money",)],
        ["text"],
    )
    out = with_lang_id(df, "text", method="marker").collect()[0]
    assert out["language"] == "en"
    assert out["language_confidence"] > 0.0


def test_lm_score_orders_fluent_above_gibberish(spark):
    from yelp_streaming_etl_pipeline_spark.functions.lang_trigrams import (
        with_lm_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "the food was wonderful and the service was quick and friendly"),
            (2, "zxq wvk jjx qqp zzt rrw mmv bbn ccx ddz"),
            (3, "12345 67890 00000 11111 22222 33333"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["lm_score"]
        for r in with_lm_score(docs, "text", "doc_id").collect()
    }
    assert got[1] > got[2] >= got[3] >= 0.0
    assert got[1] > 1.0  # fluent seed-like prose scores well
