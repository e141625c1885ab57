"""Production-capacity learned language ID (r11, verdict item 5):
a 50-language fixture at dim=256, scored through the Arrow-batched
broadcast-weights path (the form a fastText-class K×dim model needs —
the literal-weight expression path stays for small models and its
label agreement with the Arrow path is pinned here)."""

import random

import numpy as np
import pytest

from drill_logfile_plugin_spark.operators.langid import (
    lang_id_fit,
    lang_id_learned,
    lang_id_learned_arrow,
)
from tests.test_langid import VOCAB

#: 27 additional languages (common function words, scripts spanning
#: Latin/Cyrillic/Arabic/Indic/Thai/Georgian/Armenian) on top of the
#: r10 23-language fixture -> 50 total.
VOCAB_EXTRA = {
    "no": "og det som er en til av at han hun ikke jeg så vi".split(),
    "is": "og að í á það sem er við ekki hann um en með því".split(),
    "bg": "и в не се на да е за той това от са но към".split(),
    "sr": "и у не да је се на он за су као што би него".split(),
    "hr": "je i u na se da za od kao ali bio što kada nije".split(),
    "sk": "a sa v na je to že s ako som ale po už môže".split(),
    "sl": "in za ne bi so kot tudi še lahko med bil tako kjer vendar".split(),
    "lt": "ir yra kad į tai su kaip bet jis buvo nuo dar gali jau".split(),
    "lv": "un ir ka par ar to no kā bet viņš bija vēl var arī".split(),
    "et": "ja on et ei ta see oli ka kui aga oma välja üle siis".split(),
    "sq": "dhe në për një është që me nga si por kjo do ka të".split(),
    "ca": "això amb què dels seva molt també fins aquest alguns altres qual on hi".split(),
    "eu": "eta da ez du bat egin zen baina ere hau horrek izan dira zuen".split(),
    "fa": "و در به از که این را با است برای آن بود تا هم".split(),
    "ur": "اور میں نے سے کہ یہ پر بھی تھا لیکن گیا اس وہ ہیں".split(),
    "hi": "और में नहीं है कि यह पर भी था लेकिन गया इस वह हैं".split(),
    "bn": "এবং মধ্যে না হয় যে এই উপর ও ছিল কিন্তু গিয়ে এর তিনি আছে".split(),
    "ta": "மற்றும் இந்த ஒரு என்று அது இல்லை ஆனால் அவர் நான் என மிக வந்த செய்ய உள்ள".split(),
    "te": "మరియు ఈ ఒక అని అది కాదు కానీ అతను నేను చాలా వచ్చిన చేయు ఉన్న కూడా".split(),
    "th": "และ ใน ไม่ เป็น ที่ นี้ บน ก็ ได้ แต่ ไป ของ เขา มี".split(),
    "vi": "và trong không là mà này trên cũng được nhưng đi của anh có".split(),
    "id": "dan di tidak adalah yang ini pada juga telah tetapi pergi dari dia ada".split(),
    "sw": "na katika si ni ambayo hii juu pia alikuwa lakini kwenda ya yeye kuwa".split(),
    "af": "hierdie gegaan baie sal hulle teen oor omdat daar gesê kon word nuwe vir".split(),
    "mt": "u fil mhux hija li dan fuq ukoll kien iżda mar tiegħu huwa għandu".split(),
    "ka": "და არის არ რომ ეს ის იყო მაგრამ წავიდა მისი მან აქვს ძალიან ახალი".split(),
    "hy": "և մեջ չէ է որ այս վրա նաև էր բայց գնաց նրա նա ունի".split(),
}

VOCAB50 = {**VOCAB, **VOCAB_EXTRA}
assert len(VOCAB50) == 50


def _corpus50(spark, n_per_lang: int, seed: int):
    rnd = random.Random(seed)
    rows = []
    for lang, words in VOCAB50.items():
        for _ in range(n_per_lang):
            rows.append((lang, " ".join(rnd.choices(words, k=12))))
    return spark.createDataFrame(rows, "lang string, text string")


@pytest.fixture(scope="module")
def fitted50(spark):
    train = _corpus50(spark, n_per_lang=8, seed=42)
    return lang_id_fit(train, dim=256, iters=10, lr=1.0)


def test_accuracy_floor_on_50_language_heldout(spark, fitted50):
    held = _corpus50(spark, n_per_lang=4, seed=4242)
    scored = lang_id_learned_arrow(held, fitted50, out_col="pred")
    agg = scored.selectExpr(
        "avg(cast(pred = lang as double)) as acc", "count(*) as n"
    ).first()
    assert agg["n"] == 50 * 4
    assert agg["acc"] >= 0.9, f"held-out accuracy {agg['acc']:.3f}"


def test_arrow_labels_agree_with_expression_path(spark, fitted50):
    """Same model, same rows: the two scoring paths must emit the same
    labels (they sum identical per-gram terms; only float addition
    order differs, which the fixture's margins dwarf)."""
    held = _corpus50(spark, n_per_lang=2, seed=99)
    a = lang_id_learned(held, fitted50, out_col="p").select("p").collect()
    b = lang_id_learned_arrow(held, fitted50, out_col="p").select(
        "p"
    ).collect()
    assert [r["p"] for r in a] == [r["p"] for r in b]


def test_arrow_plan_is_single_arrow_eval_no_shuffle(spark, fitted50):
    df = spark.createDataFrame([("hello world",)], "text string")
    out = lang_id_learned_arrow(df, fitted50, scores_col="logits")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # the one sanctioned Python node


def test_arrow_und_and_scores_contract(spark, fitted50):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "dan di tidak adalah yang ini")],
        "id long, text string",
    )
    got = {
        r["id"]: r
        for r in lang_id_learned_arrow(
            df, fitted50, scores_col="logits"
        ).collect()
    }
    assert got[0]["lang_pred"] == "und" and got[0]["logits"] is None
    assert got[1]["lang_pred"] == "und" and got[1]["logits"] is None
    assert got[2]["lang_pred"] == "id"
    assert len(got[2]["logits"]) == 50


def test_arrow_scores_match_expression_logits(spark, fitted50):
    """Logits agree to float tolerance (not bitwise — addition order
    differs by design)."""
    held = _corpus50(spark, n_per_lang=1, seed=123).limit(10)
    a = lang_id_learned(held, fitted50, scores_col="z").select("z").collect()
    b = lang_id_learned_arrow(held, fitted50, scores_col="z").select(
        "z"
    ).collect()
    for ra, rb in zip(a, b):
        assert np.allclose(ra["z"], rb["z"], rtol=1e-9, atol=1e-9)


def test_artifact_roundtrip_feeds_arrow_path(tmp_path, spark, fitted50):
    from drill_logfile_plugin_spark.artifacts import (
        load_langid_model,
        save_langid_model,
    )

    path = str(tmp_path / "langid50.json")
    save_langid_model(path, fitted50)
    loaded = load_langid_model(path)
    held = _corpus50(spark, n_per_lang=1, seed=7)
    a = lang_id_learned_arrow(held, fitted50).collect()
    b = lang_id_learned_arrow(held, loaded).collect()
    assert [r["lang_pred"] for r in a] == [r["lang_pred"] for r in b]


def test_clean_corpus_adopts_arrow_lang_column(spark, fitted50):
    """The capacity composition: score with the Arrow path first, then
    clean_corpus(lang_col=...) gates on the adopted column — no second
    scoring pass, no weight literals in the cleaning plan."""
    from drill_logfile_plugin_spark.operators.text import clean_corpus

    rows = [
        (0, "dan di tidak adalah yang ini pada juga telah tetapi " * 4),
        (1, "และ ใน ไม่ เป็น ที่ นี้ บน ก็ ได้ แต่ " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scored = lang_id_learned_arrow(df, fitted50)
    kept = clean_corpus(
        scored, langs=("id",), lang_col="lang_pred",
        quality_keep=(
            "good", "too_short", "repetitive", "stopword_heavy",
            "long_tokens",
        ),
        drop_repetitive=False,
    )
    assert [r["doc_id"] for r in kept.collect()] == [0]
    with pytest.raises(ValueError, match="langid_model OR lang_col"):
        clean_corpus(scored, langid_model=fitted50, lang_col="lang_pred")
    with pytest.raises(ValueError, match="absent"):
        clean_corpus(df, lang_col="nope")
