"""Tests: EDA ops, text/image augmentation, demo engine (mlm fill, WPA
heatmap, VQA answering), t-SNE projection."""

import numpy as np
import pytest
from PIL import Image

import jax

from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.data.augmentation import (
    SimCLRTransform, TextAugmentation, eda, get_only_chars,
    random_deletion, random_insertion, random_swap, synonym_replacement)
from rmcl_tpu.data.tokenizer import WordPieceTokenizer, make_tiny_vocab
from rmcl_tpu.demos.inference import DemoEngine, prepare_image
from rmcl_tpu.models.vilt import init_vilt


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    make_tiny_vocab(str(p), ["dog", "cat", "animal", "grass", "photo",
                             "sitting", "on", "the", "a", "what", "is"])
    return WordPieceTokenizer(str(p))


# ------------------------------------------------------------------- eda
def test_get_only_chars():
    assert get_only_chars("A Dog's-Day!!  ") == "a dogs day"


def test_eda_ops_no_wordnet():
    syn = lambda w: {"dog": ["hound"], "cat": ["feline"]}.get(w, [])
    words = "the dog chases the cat".split()
    out = synonym_replacement(words, 2, syn)
    assert out != words and ("hound" in out or "feline" in out)
    out = random_insertion(words, 1, syn)
    assert len(out) == len(words) + 1
    out = random_swap(words, 2)
    assert sorted(out) == sorted(words)
    out = random_deletion(words, 0.99)
    assert 1 <= len(out) <= len(words)
    sents = eda("The dog chases the cat", num_aug=4, syn=syn)
    assert len(sents) == 4
    assert all(isinstance(s, str) and s for s in sents)


def test_text_augmentation_fallback(tok):
    cfg = build_config(max_text_len=12, type_txt_augm=("EDA",),
                       num_return_sequences=4, num_beams=4)
    ta = TextAugmentation(cfg, tok, use_pegasus=False)
    texts, ids, masks = ta.augment(["a dog sitting on the grass",
                                    "a cat on the grass"], epoch=0)
    assert len(texts) == 2
    assert ids.shape == (2, 12) and masks.shape == (2, 12)
    # selected sentence should still share words with the original
    assert any(w in texts[0] for w in ("dog", "sitting", "grass", "a"))


def test_simclr_transform_shapes():
    img = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (100, 80, 3), np.uint8))
    tr = SimCLRTransform(size=64)
    arr = tr(img)
    assert arr.ndim == 3 and arr.shape[2] == 3
    assert arr.shape[0] % 32 == 0 and arr.shape[1] % 32 == 0
    assert -1.0 <= arr.min() and arr.max() <= 1.0


# ------------------------------------------------------------ demo engine
@pytest.fixture(scope="module")
def demo_engine(tok):
    cfg = build_config(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=tok.vocab_size,
        loss_names=loss_names({"mlm": 1, "itm": 1, "vqa": 1}),
        vqav2_label_size=7, max_image_len=-1,
        use_pallas_attention=False, compute_dtype="float32", drop_rate=0.0)
    params, _ = init_vilt(jax.random.PRNGKey(0), cfg)
    return DemoEngine(cfg, params, tok,
                      id2answer={i: f"ans{i}" for i in range(7)})


@pytest.fixture(scope="module")
def pil_img():
    return Image.fromarray(np.random.RandomState(1).randint(
        0, 255, (40, 56, 3), np.uint8))


def test_prepare_image(demo_engine, pil_img):
    arr = prepare_image(pil_img, demo_engine.cfg)
    assert arr.shape == (1, 32, 48, 3)


def test_mlm_fill(demo_engine, pil_img):
    filled, steps = demo_engine.mlm_fill(
        pil_img, "a [MASK] sitting on the [MASK]")
    assert "[MASK]" not in filled
    assert len(steps) == 3  # original + 2 fills


def test_wpa_heatmap(demo_engine, pil_img):
    heat, token = demo_engine.wpa_heatmap(
        pil_img, "a dog sitting on the grass", token_idx=2,
        ot_iterations=10)
    gh, gw = 32 // 16, 48 // 16
    assert heat.shape == (gh, gw)
    assert np.all(heat >= 0) and np.all(heat <= 1)
    assert isinstance(token, str) and token


def test_vqa_answer(demo_engine, pil_img):
    out = demo_engine.answer(pil_img, "what animal is this", topk=3)
    assert len(out) == 3
    names, probs = zip(*out)
    assert all(n.startswith("ans") for n in names)
    assert probs[0] >= probs[1] >= probs[2]


# ------------------------------------------------------------------ tsne
def test_tsne_projection(tmp_path):
    from rmcl_tpu.eval.tsne import tsne_projection
    r = np.random.RandomState(0)
    q = r.randn(8, 16)
    k = q + 0.01 * r.randn(8, 16)
    queue = r.randn(16, 64)
    out = tsne_projection(q, k, queue, out_path=str(tmp_path / "t.png"),
                          max_negatives=32, perplexity=5)
    assert out is not None


def test_special_token_roundtrip(tok):
    toks = tok.tokenize("a [MASK] on the grass")
    assert "[MASK]" in toks
    ids = tok(["a [MASK] dog"], max_length=8,
              return_tensors="np")["input_ids"][0]
    assert tok.mask_token_id in ids


def test_text_augmentation_pegasus_sbert_wiring(tok):
    """Exercises the PRIMARY reference path (PEGASUS paraphrase + SBERT
    cosine ranking, reference augmentation/text_augmentation.py:19-52)
    with mocked models — the real weights are environment-gated (zero
    egress; see PARITY.md).  Validates: generate() receives the
    configured beams/sequences, candidates pool = paraphrases (+EDA),
    ranking picks the epoch-th most similar, and the fixed
    last-loop-assignment reference bug stays fixed (per-sentence pick)."""
    import torch

    cfg = build_config(max_text_len=12, type_txt_augm=("PEGASUS",),
                       num_return_sequences=3, num_beams=3)
    ta = TextAugmentation(cfg, tok, use_pegasus=False)

    calls = {}

    class FakePegasusTok:
        def __call__(self, sents, **kw):
            calls["input"] = list(sents)
            return {"input_ids": torch.zeros((1, 4), dtype=torch.long)}

        def batch_decode(self, gen, skip_special_tokens=True):
            s = calls["input"][0]
            return [s + " rephrased", "totally different words entirely",
                    s]

    class FakePegasus:
        def generate(self, input_ids=None, max_length=None, num_beams=None,
                     num_return_sequences=None, **kw):
            calls["num_beams"] = num_beams
            calls["num_return_sequences"] = num_return_sequences
            return torch.zeros((num_return_sequences, 4), dtype=torch.long)

    class FakeRanker:
        """Embeds a sentence as a bag-of-words indicator -> cosine ranks
        by word overlap, like SBERT would for these toy inputs."""
        def encode(self, x, show_progress_bar=False):
            sents = [x] if isinstance(x, str) else list(x)
            vocab = sorted({w for s in sents for w in s.split()} | {"_"})
            out = np.zeros((len(sents), 64), np.float32)
            for i, s in enumerate(sents):
                for w in s.split():
                    out[i, hash(w) % 64] += 1.0
            return out[0] if isinstance(x, str) else out

    class FakeUtil:
        @staticmethod
        def pytorch_cos_sim(a, b):
            a = torch.nn.functional.normalize(a.float(), dim=-1)
            b = torch.nn.functional.normalize(b.float(), dim=-1)
            return a @ b.T

    ta.pegasus = FakePegasus()
    ta.pegasus_tok = FakePegasusTok()
    ta.ranker = FakeRanker()
    ta._util = FakeUtil()

    texts0, ids, masks = ta.augment(["a dog runs"], epoch=0)
    assert calls["num_beams"] == 3 and calls["num_return_sequences"] == 3
    # epoch 0 -> most similar candidate = the identical paraphrase
    assert texts0[0] == "a dog runs"
    texts1, _, _ = ta.augment(["a dog runs"], epoch=1)
    assert texts1[0] == "a dog runs rephrased"
    # least similar last
    texts2, _, _ = ta.augment(["a dog runs"], epoch=2)
    assert texts2[0] == "totally different words entirely"
    assert ids.shape == (1, 12) and masks.shape == (1, 12)
