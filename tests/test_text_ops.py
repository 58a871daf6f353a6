"""Text-analysis kernels: token counting, quality scoring, fingerprints,
language ID (unit level + Ray integration over documents.parquet)."""

import numpy as np
import pandas as pd
import pytest

from schema_guru_ray.stages.text import Fingerprinter, LangId, QualityScorer, TokenCounter


def df(texts):
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


class TestTokenCounter:
    def test_counts(self):
        out = TokenCounter()(df(["a b  c", "", "one", "  x "]))
        assert list(out["n_tokens"]) == [3, 0, 1, 1]

    def test_wordpieces(self):
        out = TokenCounter()(df(["internationalization", "a b!"]))
        # 20-char word → 5 pieces; "a b!" → 1 + 1 pieces + 1 punct
        assert list(out["n_wordpieces"]) == [5, 3]


class TestQualityScorer:
    def test_features(self):
        out = QualityScorer()(df(["The cat and the dog!!", "zxqw"]))
        assert out["n_chars"].tolist() == [21, 4]
        assert out["stopword_ratio"][0] > 0.3
        assert out["stopword_ratio"][1] == 0.0
        assert out["punct_ratio"][0] > 0.05
        assert 0 < out["unique_word_ratio"][0] <= 1.0

    def test_empty(self):
        out = QualityScorer()(df([""]))
        assert out["n_words"][0] == 0


class TestFingerprinter:
    def test_exact_dup_invariance(self):
        out = Fingerprinter()(df(["Hello   World", "hello world", "other doc"]))
        assert out["fp_md5"][0] == out["fp_md5"][1]
        assert out["fp_md5"][0] != out["fp_md5"][2]

    def test_winnow_robust_to_small_edit(self):
        base = "the quick brown fox jumps over the lazy dog " * 10
        out = Fingerprinter()(df([base, base + "extra tail", "completely different text"]))
        # winnow fingerprints of near-identical docs share most min-hashes
        # (xor-fold differs, but must differ from unrelated text too)
        assert out["fp_winnow"][0] != out["fp_winnow"][2]

    def test_deterministic(self):
        a = Fingerprinter()(df(["some document"]))
        b = Fingerprinter()(df(["some document"]))
        assert a["fp_winnow"][0] == b["fp_winnow"][0]


class TestLangId:
    def test_detects_languages(self):
        out = LangId()(
            df(
                [
                    "the cat sat on the mat and it was not a dog",
                    "der Hund ist in den Garten gelaufen und die Katze auch",
                    "le chat est dans la maison et il ne veut pas sortir",
                    "el perro y el gato están en la casa para comer",
                ]
            )
        )
        assert list(out["lang_pred"]) == ["en", "de", "fr", "es"]

    def test_unknown(self):
        out = LangId()(df(["zxqw qwkj poiu", ""]))
        assert list(out["lang_pred"]) == ["und", "und"]


@pytest.mark.usefixtures("ray_session")
class TestTextPipeline:
    def test_over_documents(self, sf_dir):
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        out = ds.map_batches(TokenCounter(), batch_format="pandas").to_pandas()
        assert len(out) == ds.count()
        assert (out["n_tokens"] > 0).all()
