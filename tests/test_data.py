"""Data-layer tests: transforms math, MLM collators, arrow datasets,
collate static shapes, sharded loader."""

import io
import os

import numpy as np
import pyarrow as pa
import pytest
from PIL import Image

from rmcl_tpu.data.arrow_dataset import ArrowDataset, collate
from rmcl_tpu.data.datamodule import MultitaskDataModule
from rmcl_tpu.data.datasets import VQAv2Dataset, vqa_collate_extras
from rmcl_tpu.data.loader import ConcatDataset, DataLoader
from rmcl_tpu.data.mlm import MLMCollator
from rmcl_tpu.data.tokenizer import WordPieceTokenizer, make_tiny_vocab
from rmcl_tpu.data.transforms import (
    RandAugment, fit_bucket, min_max_resize, min_max_size,
    pixelbert_transform, to_normalized_array)


# ------------------------------------------------------------ transforms
def test_min_max_size_matches_reference_rules():
    # shorter side -> size, /32 floor (reference transforms/utils.py:5-27)
    assert min_max_size(800, 600, 384, 639) == (512, 384)
    # longer-side cap then /32
    w, h = min_max_size(2000, 500, 384, 639)
    assert h % 32 == 0 and w % 32 == 0
    assert max(w, h) <= 639 and min(w, h) <= 384
    # square image
    assert min_max_size(500, 500, 384, 639) == (384, 384)


def test_pixelbert_transform_range_and_bucket():
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (500, 700, 3), np.uint8))
    tr = pixelbert_transform(size=384, bucket_hw=(384, 640))
    arr = tr(img)
    assert arr.ndim == 3 and arr.shape[2] == 3
    assert arr.shape[0] <= 384 and arr.shape[1] <= 640
    assert arr.shape[0] % 32 == 0 and arr.shape[1] % 32 == 0
    assert -1.0 <= arr.min() and arr.max() <= 1.0


def test_fit_bucket_shrinks_oversize():
    img = Image.new("RGB", (608, 384))
    out = fit_bucket(img, (384, 640))
    assert out.size[1] <= 384 and out.size[0] <= 640


def test_randaug_returns_image():
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8))
    out = RandAugment(2, 9)(img)
    assert out.size == (64, 64)


# ------------------------------------------------------------------- mlm
@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    make_tiny_vocab(str(p), ["dog", "cat", "running", "jumping", "park",
                             "small", "big", "the", "quick"])
    return WordPieceTokenizer(str(p))


def test_mlm_collator_stats(tok):
    enc = tok(["a dog running in the park"] * 50, max_length=16,
              return_tensors="np")
    coll = MLMCollator(tok, mlm_prob=0.15, seed=0)
    ids, labels = coll(enc["input_ids"], enc["special_tokens_mask"])
    masked = labels != -100
    # labels only on non-special masked positions, originals preserved
    assert masked.any()
    orig = enc["input_ids"]
    assert np.all(labels[masked] == orig[masked])
    # special tokens never masked
    assert not (masked & enc["special_tokens_mask"].astype(bool)).any()
    # ~80% of masked positions became [MASK]
    frac_mask = (ids[masked] == tok.mask_token_id).mean()
    assert 0.55 < frac_mask <= 1.0


def test_whole_word_masking_groups(tok):
    coll = MLMCollator(tok, mlm_prob=0.45, whole_word=True, seed=0)
    enc = tok(["jumping dog"] * 8, max_length=8, return_tensors="np")
    ids, labels = coll(enc["input_ids"], enc["special_tokens_mask"])
    toks0 = tok.convert_ids_to_tokens(enc["input_ids"][0])
    # find a multi-piece word; if masked, ALL its pieces must be masked
    for b in range(8):
        m = labels[b] != -100
        for pos in range(1, len(toks0)):
            t = tok.convert_ids_to_tokens(int(enc["input_ids"][b][pos]))
            if t.startswith("##") and m[pos]:
                assert m[pos - 1] or tok.convert_ids_to_tokens(
                    int(enc["input_ids"][b][pos - 1])).startswith("##")


# ------------------------------------------------------------ arrow data
def _png_bytes(seed, size=(48, 40)):
    img = Image.fromarray(
        np.random.RandomState(seed).randint(0, 255, (*size, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def arrow_dir(tmp_path_factory, tok):
    d = tmp_path_factory.mktemp("arrow")
    # caption-style table
    rows = {
        "image": [_png_bytes(i) for i in range(6)],
        "caption": [["a dog running", "the quick dog"] for _ in range(6)],
        "image_id": [f"COCO_train_{i:012d}.jpg" for i in range(6)],
        "split": ["train"] * 6,
    }
    table = pa.table(rows)
    with pa.OSFile(str(d / "coco_caption_karpathy_train.arrow"), "wb") as f:
        with pa.RecordBatchFileWriter(f, table.schema) as w:
            w.write_table(table)
    # vqa-style table
    vrows = {
        "image": [_png_bytes(100 + i) for i in range(4)],
        "questions": [["is the dog big"] for _ in range(4)],
        "answers": [[["yes", "no"]] for _ in range(4)],
        "answer_labels": [[[0, 1]] for _ in range(4)],
        "answer_scores": [[[1.0, 0.3]] for _ in range(4)],
        "question_id": [[i] for i in range(4)],
        "split": ["train"] * 4,
    }
    vt = pa.table(vrows)
    for name in ("vqav2_train", "vqav2_trainable_val", "vqav2_val"):
        with pa.OSFile(str(d / f"{name}.arrow"), "wb") as f:
            with pa.RecordBatchFileWriter(f, vt.schema) as w:
                w.write_table(vt)
    return str(d)


def test_arrow_dataset_suite_and_collate(arrow_dir, tok):
    ds = ArrowDataset(
        arrow_dir, ["pixelbert"], 64,
        names=["coco_caption_karpathy_train"], text_column_name="caption",
        max_text_len=12, draw_false_image=1, draw_false_text=2,
        bucket_hw=(64, 64), tokenizer=tok)
    assert len(ds) == 12  # 6 images x 2 deduped captions
    suite = ds[0]
    assert "image" in suite and "text" in suite and "false_image_0" in suite
    assert "false_text_0" in suite and "false_text_1" in suite

    coll = MLMCollator(tok, seed=0)
    batch = collate([ds[i] for i in range(4)], coll, bucket_hw=(64, 64))
    assert batch["image"].shape == (4, 64, 64, 3)
    assert batch["text_ids"].shape == (4, 12)
    assert batch["text_ids_mlm"].shape == (4, 12)
    assert batch["text_masks"].shape == (4, 12)
    assert np.all(batch["text_labels"] == -100)
    assert batch["false_text_0_ids"].shape == (4, 12)
    # zero padding outside the image region
    assert batch["image"].dtype == np.float32


def test_vqa_dataset_and_targets(arrow_dir, tok):
    ds = VQAv2Dataset(
        data_dir=arrow_dir, transform_keys=["pixelbert"], image_size=64,
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok, split="val")
    item = ds[0]
    assert item["vqa_labels"] == [0, 1]
    coll = MLMCollator(tok, seed=0)
    batch = collate([ds[i] for i in range(2)], coll, bucket_hw=(64, 64))
    batch = vqa_collate_extras([ds[i] for i in range(2)], batch, 5)
    assert batch["vqa_targets"].shape == (2, 5)
    np.testing.assert_allclose(batch["vqa_targets"][0, 0], 1.0)
    np.testing.assert_allclose(batch["vqa_targets"][0, 1], 0.3)


def test_loader_sharding_and_determinism(arrow_dir, tok):
    ds = ArrowDataset(
        arrow_dir, ["pixelbert"], 64,
        names=["coco_caption_karpathy_train"], text_column_name="caption",
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok)
    coll = MLMCollator(tok, seed=0)

    def cfn(samples):
        return collate(samples, coll, bucket_hw=(64, 64))

    # two "hosts" see disjoint shards that cover everything
    l0 = DataLoader(ds, 2, cfn, shuffle=True, seed=1, process_index=0,
                    process_count=2, num_workers=2)
    l1 = DataLoader(ds, 2, cfn, shuffle=True, seed=1, process_index=1,
                    process_count=2, num_workers=2)
    seen0 = [tuple(b["text_ids"][i]) for b in l0 for i in range(2)]
    seen1 = [tuple(b["text_ids"][i]) for b in l1 for i in range(2)]
    assert len(seen0) == len(seen1) == 6
    # same epoch -> deterministic
    seen0b = [tuple(b["text_ids"][i]) for b in l0 for i in range(2)]
    assert seen0 == seen0b
    # new epoch -> different order
    l0.set_epoch(1)
    seen0c = [tuple(b["text_ids"][i]) for b in l0 for i in range(2)]
    assert sorted(seen0) != seen0c or seen0 != seen0c


def test_loader_skip_batches(arrow_dir, tok):
    """set_epoch(e, skip_batches=k) fast-forwards the epoch's batch
    index stream past exactly k batches (mid-epoch preemption resume)
    without changing len() or the epoch permutation."""
    ds = ArrowDataset(
        arrow_dir, ["pixelbert"], 64,
        names=["coco_caption_karpathy_train"], text_column_name="caption",
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok)
    coll = MLMCollator(tok, seed=0)

    def cfn(samples):
        return collate(samples, coll, bucket_hw=(64, 64))

    l = DataLoader(ds, 2, cfn, shuffle=True, seed=1, num_workers=2)
    full = [(k, tuple(b), tuple(v)) for k, b, v in l._batches()]
    n = len(l)
    l.set_epoch(0, skip_batches=1)
    # the absolute batch index (collate RNG seed) survives the skip
    assert [(k, tuple(b), tuple(v)) for k, b, v in l._batches()] == full[1:]
    assert len(l) == n
    l.set_epoch(0)  # plain set_epoch resets the skip
    assert [(k, tuple(b), tuple(v)) for k, b, v in l._batches()] == full
    l.set_epoch(0, skip_batches=10 ** 6)  # over-skip is empty, not error
    assert list(l._batches()) == []


def test_multitask_datamodule_vqa(arrow_dir, tok, tmp_path):
    from rmcl_tpu.core.config import build_config, loss_names

    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "cat", "big", "the", "is"])
    cfg = build_config(
        datasets=("vqa",), data_root=arrow_dir,
        loss_names=loss_names({"vqa": 1}), image_size=64,
        image_bucket_hw=(64, 64), max_text_len=12, vqav2_label_size=5,
        num_workers=2)
    dm = MultitaskDataModule(cfg, vocab_path=vocab)
    dm.setup()
    assert dm.answer2id == {"yes": 0, "no": 1}
    assert dm.id2answer[0] == "yes"
    loader = dm.train_loader(per_host_batch=2)
    batch = next(iter(loader))
    # default image_layout="patch": (B, gh*gw, P*P*3) rows
    gh, gw = 64 // cfg.patch_size, 64 // cfg.patch_size
    assert batch["image"].shape == (2, gh * gw, cfg.patch_size ** 2 * 3)
    assert batch["vqa_targets"].shape == (2, 5)


# ---------------------------------------------------------------- writers
def test_nlvr2_writer_roundtrip(tmp_path, tok):
    import json
    from rmcl_tpu.data.writers import make_arrow_nlvr2
    from rmcl_tpu.data.datasets import NLVR2Dataset

    root = tmp_path / "raw"
    (root / "nlvr2" / "data").mkdir(parents=True)
    (root / "dev").mkdir()
    rows = []
    for i in range(3):
        iden = f"dev-{i}-0"
        rows.append({"identifier": f"{iden}-0",
                     "sentence": "the dog is big",
                     "label": "True" if i % 2 == 0 else "False"})
        img = Image.fromarray(
            np.random.RandomState(i).randint(0, 255, (40, 40, 3), np.uint8))
        img.save(root / "dev" / f"{iden}-img0.png")
        img.save(root / "dev" / f"{iden}-img1.png")
    with open(root / "nlvr2" / "data" / "dev.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    out = tmp_path / "arrow"
    make_arrow_nlvr2(str(root), str(out))
    ds = NLVR2Dataset(
        data_dir=str(out), transform_keys=["pixelbert"], image_size=64,
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok, split="val")
    assert len(ds) == 3
    item = ds[0]
    assert isinstance(item["answers"], (bool, np.bool_))
    assert item["table_name"] == "nlvr2_dev"


def test_vqa_writer_roundtrip(tmp_path, tok):
    import json
    from rmcl_tpu.data.writers import make_arrow_vqa, vqa_score

    assert vqa_score(0) == 0.0 and vqa_score(1) == 0.3
    assert vqa_score(3) == 0.9 and vqa_score(7) == 1.0

    root = tmp_path / "raw"
    for d in ("train2014", "val2014", "test2015"):
        (root / d).mkdir(parents=True)
    qs, annots = {"train": [], "val": []}, {"train": [], "val": []}
    qid = 0
    for split, dirname in (("train", "train2014"), ("val", "val2014")):
        for i in range(3):
            iid = i + (0 if split == "train" else 100)
            img = Image.fromarray(np.random.RandomState(iid).randint(
                0, 255, (40, 40, 3), np.uint8))
            img.save(root / dirname /
                     f"COCO_{dirname}_{iid:012d}.jpg")
            qs[split].append({"image_id": iid, "question_id": qid,
                              "question": "is the dog big"})
            # 10 annotators, all answer "yes" -> normalizes + scores 1.0
            annots[split].append({
                "image_id": iid, "question_id": qid,
                "multiple_choice_answer": "yes",
                "answers": [{"answer": "yes"}] * 10})
            qid += 1
    # make "yes" appear >= 9 times in major answers
    for split in ("train", "val"):
        for extra in range(4):
            annots[split].append(annots[split][0])

    def dump(name, obj):
        with open(root / name, "w") as f:
            json.dump(obj, f)

    dump("v2_OpenEnded_mscoco_train2014_questions.json",
         {"questions": qs["train"]})
    dump("v2_OpenEnded_mscoco_val2014_questions.json",
         {"questions": qs["val"]})
    dump("v2_OpenEnded_mscoco_test2015_questions.json", {"questions": []})
    dump("v2_OpenEnded_mscoco_test-dev2015_questions.json",
         {"questions": []})
    dump("v2_mscoco_train2014_annotations.json",
         {"annotations": annots["train"]})
    dump("v2_mscoco_val2014_annotations.json", {"annotations": annots["val"]})

    out = tmp_path / "arrow"
    make_arrow_vqa(str(root), str(out))
    assert (out / "vqav2_train.arrow").exists()
    assert (out / "vqav2_trainable_val.arrow").exists()

    ds = VQAv2Dataset(
        data_dir=str(out), transform_keys=["pixelbert"], image_size=64,
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok, split="train")
    assert len(ds) >= 3
    item = ds[0]
    assert item["vqa_answer"] == ["yes"]
    assert item["vqa_scores"] == [1.0]


# ----------------------------------------------------------- native C++
def test_native_wordpiece_parity_and_speed(tok):
    """C++ batch encoder must be token-exact vs the Python implementation."""
    from rmcl_tpu.data._native import load_wordpiece
    lib = load_wordpiece()
    assert lib is not None, "g++ toolchain expected in this image"
    assert tok._native is not None

    texts = [
        "a dog running in the park",
        "The QUICK dog!! jumping, over...",
        "a [MASK] sitting on the grass",
        "unknownword dogcat jumping",
        "",
        "punctuation-only: ?!.",
    ] * 20
    ids_c, mask_c = tok._batch_encode_native(texts, 16)
    py = WordPieceTokenizer(tok_vocab_path(tok), use_native=False)
    ids_p, mask_p = py.batch_encode(texts, 16)
    np.testing.assert_array_equal(ids_c, ids_p)
    np.testing.assert_array_equal(mask_c, mask_p)

    # non-ASCII routes to python path (no crash, same shapes)
    ids2, mask2 = tok.batch_encode(["café au lait"], 16)
    assert ids2.shape == (1, 16)

    import time
    big = texts * 20  # 2400 sentences ~ greedy-attack scale
    t0 = time.perf_counter()
    tok._batch_encode_native(big, 40)
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    py.batch_encode(big, 40)
    t_p = time.perf_counter() - t0
    print(f"native {t_c*1e3:.1f}ms vs python {t_p*1e3:.1f}ms "
          f"({t_p/max(t_c,1e-9):.1f}x)")
    assert t_c < t_p  # native must actually be faster


def tok_vocab_path(tok):
    # reconstruct: the module fixture wrote vocab.txt; find via vocab dict
    import tempfile, os
    p = os.path.join(tempfile.gettempdir(), f"vocab_{id(tok)}.txt")
    if not os.path.exists(p):
        inv = sorted(tok.vocab.items(), key=lambda kv: kv[1])
        with open(p, "w", encoding="utf-8") as f:
            f.write("\n".join(k for k, _ in inv) + "\n")
    return p


def test_loader_eval_wraparound(arrow_dir, tok):
    """drop_last=False pads the final batch by wrap-around (static shapes,
    DistributedSampler-style repetition)."""
    ds = ArrowDataset(
        arrow_dir, ["pixelbert"], 64,
        names=["coco_caption_karpathy_train"], text_column_name="caption",
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok)
    assert len(ds) == 12
    coll = MLMCollator(tok, seed=0)

    def cfn(samples):
        return collate(samples, coll, bucket_hw=(64, 64))

    l = DataLoader(ds, 5, cfn, shuffle=False, drop_last=False, num_workers=2)
    batches = list(l)
    assert len(batches) == 3              # ceil(12/5) with padding
    assert all(b["text_ids"].shape == (5, 12) for b in batches)
    l2 = DataLoader(ds, 5, cfn, shuffle=False, drop_last=True, num_workers=2)
    assert len(list(l2)) == 2             # train mode still drops


def test_wwm_matches_hf_collator(tmp_path):
    """Bit-exact mask-pattern parity with HF DataCollatorForWholeWordMask
    (the reference's collator, vilt/datamodules/datamodule_base.py:57-61)
    when both consume the same Mersenne stream: HF shuffles with the
    global `random`, ours with `random.Random(seed)` — seeding both
    identically must give identical label patterns.  The 80/10/10
    replacement ids use different generators (torch vs numpy) and are
    excluded; only the mask SELECTION is the WWM algorithm."""
    import random as pyrandom
    transformers = pytest.importorskip("transformers")
    from transformers import BertTokenizer, DataCollatorForWholeWordMask

    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "cat", "running", "jumping", "park",
                            "small", "big", "the", "quick", "playground",
                            "wonderful"])
    ours = WordPieceTokenizer(vocab)
    hf = BertTokenizer(vocab_file=vocab, do_lower_case=True)

    sents = ["the quick dog running in the playground",
             "a wonderful small cat jumping", "dog park", "big big dog",
             "jumping jumping jumping wonderful"] * 4
    T = 16
    enc = ours(sents, max_length=T, return_tensors="np")

    seed = 1234
    coll = MLMCollator(ours, mlm_prob=0.15, whole_word=True, seed=seed)
    _, labels = coll(enc["input_ids"], enc["special_tokens_mask"])
    our_mask = labels != -100

    # HF consumes the SAME stream via the seeded global random module
    pyrandom.seed(seed)
    hf_coll = DataCollatorForWholeWordMask(tokenizer=hf,
                                           mlm_probability=0.15)
    examples = []
    for s in sents:
        e = hf.encode(s)  # [CLS] ... [SEP], unpadded
        assert len(e) <= T
        examples.append({"input_ids": e})
    out = hf_coll(examples)
    hf_labels = out["labels"].numpy()
    hf_mask = np.zeros_like(our_mask)
    for i, ex in enumerate(examples):
        L = len(ex["input_ids"])
        hf_mask[i, :L] = hf_labels[i, :L] != -100

    np.testing.assert_array_equal(our_mask, hf_mask)


def test_caption_writers_roundtrip(tmp_path, tok):
    """coco/f30k karpathy + SBU + VG + conceptual-caption writers produce
    arrow files the corresponding datasets read back (C16 beyond the
    nlvr2/vqa roundtrips)."""
    import json
    from rmcl_tpu.data.datasets import (
        CocoCaptionKarpathyDataset, ConceptualCaptionDataset,
        F30KCaptionKarpathyDataset, SBUCaptionDataset,
        VisualGenomeCaptionDataset)
    from rmcl_tpu.data.writers import (
        make_arrow_coco_karpathy, make_arrow_conceptual_caption,
        make_arrow_f30k_karpathy, make_arrow_sbu, make_arrow_vg)

    def png(path, seed):
        Image.fromarray(np.random.RandomState(seed).randint(
            0, 255, (40, 40, 3), np.uint8)).save(path, format="PNG")

    out = tmp_path / "arrow"
    out.mkdir()
    dskw = dict(data_dir=str(out), transform_keys=["pixelbert"],
                image_size=64, max_text_len=12, bucket_hw=(64, 64),
                tokenizer=tok)

    # ---- coco karpathy (train2014/val2014 + dataset_coco.json)
    root = tmp_path / "coco"
    (root / "karpathy").mkdir(parents=True)
    (root / "train2014").mkdir()
    (root / "val2014").mkdir()
    entries = []
    for i, split in enumerate(["train", "val", "test", "restval"]):
        name = f"img{i}.jpg"
        sub = "train2014" if split in ("train", "restval") else "val2014"
        png(root / sub / name, i)
        entries.append({"filename": name, "split": split,
                        "sentences": [{"raw": f"a dog in the park {i}"}]})
    with open(root / "karpathy" / "dataset_coco.json", "w") as f:
        json.dump({"images": entries}, f)
    make_arrow_coco_karpathy(str(root), str(out))
    ds = CocoCaptionKarpathyDataset(split="train", **dskw)
    assert len(ds) == 2          # train + restval
    assert "image" in ds[0] and "text" in ds[0]
    assert len(CocoCaptionKarpathyDataset(split="test", **dskw)) == 1

    # ---- f30k karpathy
    root = tmp_path / "f30k"
    (root / "karpathy").mkdir(parents=True)
    (root / "flickr30k-images").mkdir()
    entries = []
    for i, split in enumerate(["train", "val", "test"]):
        name = f"f{i}.jpg"
        png(root / "flickr30k-images" / name, 10 + i)
        entries.append({"filename": name, "split": split,
                        "sentences": [{"raw": f"a cat on the street {i}"}]})
    with open(root / "karpathy" / "dataset_flickr30k.json", "w") as f:
        json.dump({"images": entries}, f)
    make_arrow_f30k_karpathy(str(root), str(out))
    assert len(F30KCaptionKarpathyDataset(split="train", **dskw)) == 1
    assert len(F30KCaptionKarpathyDataset(split="test", **dskw)) == 1

    # ---- sbu (annot.json + images/)
    root = tmp_path / "sbu"
    (root / "images").mkdir(parents=True)
    annot = []
    for i in range(3):
        name = f"s{i}.jpg"
        png(root / "images" / name, 20 + i)
        annot.append({"filename": name, "caption": f"a street scene {i}"})
    with open(root / "annot.json", "w") as f:
        json.dump(annot, f)
    make_arrow_sbu(str(root), str(out))
    ds = SBUCaptionDataset(split="train", **dskw)
    assert len(ds) == 3

    # ---- vg (region_descriptions.json + images/VG_100K)
    root = tmp_path / "vg"
    (root / "annotations").mkdir(parents=True)
    (root / "images" / "VG_100K").mkdir(parents=True)
    regions = []
    for iid in (1, 2):
        png(root / "images" / "VG_100K" / f"{iid}.jpg", 30 + iid)
        regions.append({"regions": [
            {"image_id": iid, "phrase": f"a tree {iid}"},
            {"image_id": iid, "phrase": f"a car {iid}"}]})
    with open(root / "annotations" / "region_descriptions.json", "w") as f:
        json.dump(regions, f)
    make_arrow_vg(str(root), str(out))
    ds = VisualGenomeCaptionDataset(split="train", **dskw)
    assert len(ds) == 4          # 2 images x 2 region captions

    # ---- conceptual captions (val split: 1 shard)
    root = tmp_path / "gcc"
    (root / "images_val").mkdir(parents=True)
    with open(root / "val.tsv", "w") as f:
        for i in range(2):
            png(root / "images_val" / str(i), 40 + i)
            f.write(f"a scenic view {i}\thttp://x/{i}\n")
    make_arrow_conceptual_caption(str(root), str(out))
    ds = ConceptualCaptionDataset(split="val", **dskw)
    assert len(ds) == 2


def test_skip_unused_false_draws(arrow_dir, tmp_path):
    """task_moco (itm inactive) skips the false-image decode entirely;
    ITM configs keep it; the knob restores reference behavior (which
    decodes draw_false_image=1 even for moco, reference config.py:39)."""
    from rmcl_tpu.core.config import build_config, loss_names

    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "quick", "the", "a"])

    def batch_for(ln, **kw):
        cfg = build_config(
            datasets=("coco",), data_root=arrow_dir,
            loss_names=loss_names(ln), image_size=32,
            image_bucket_hw=(32, 32), max_text_len=8, num_workers=1,
            per_device_batchsize=2, batch_size=2, **kw)
        dm = MultitaskDataModule(cfg, vocab_path=vocab)
        dm.setup()
        return next(iter(dm.train_loader(2)))

    moco = batch_for({"moco": 1})
    assert "false_image_0" not in moco          # skipped: nothing reads it

    itm = batch_for({"itm": 1, "mlm": 1})
    assert "false_image_0" in itm               # itm consumes it

    off = batch_for({"moco": 1}, skip_unused_false_draws=False)
    assert "false_image_0" in off               # reference-faithful mode


def test_loader_process_workers(arrow_dir, tok):
    """Fork-based worker processes (cfg.num_worker_procs,
    data/loader.py:_iter_procs): same batch-index stream and sample
    CONTENT as the thread loader for RNG-free fields, deterministic
    across worker counts (per-batch reseeding), and epoch/sharding
    semantics preserved."""
    import os as _os
    if not hasattr(_os, "fork"):
        pytest.skip("no fork on this platform")
    ds = ArrowDataset(
        arrow_dir, ["pixelbert"], 64,
        names=["coco_caption_karpathy_train"], text_column_name="caption",
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok)
    coll = MLMCollator(tok, seed=0)

    def cfn(samples):
        return collate(samples, coll, bucket_hw=(64, 64))

    def run(procs, epoch=0):
        l = DataLoader(ds, 2, cfn, shuffle=True, seed=1, num_workers=2,
                       num_worker_procs=procs)
        l.set_epoch(epoch)
        return list(l)

    thread_b = run(0)
    proc1_b = run(1)
    proc2_b = run(2)
    assert len(proc1_b) == len(thread_b) > 0
    for bt, b1, b2 in zip(thread_b, proc1_b, proc2_b):
        # the FULL batch — including the MLM masking RNG — matches the
        # thread loader bit-for-bit and is invariant to the worker
        # count: collate RNG is scoped per batch position (data/rng.py
        # batch_rng), stronger than torch's per-worker seeding
        for k in b1:
            np.testing.assert_array_equal(np.asarray(b1[k]),
                                          np.asarray(bt[k]), err_msg=k)
            np.testing.assert_array_equal(np.asarray(b1[k]),
                                          np.asarray(b2[k]), err_msg=k)
    # different epochs still reshuffle
    assert any(
        not np.array_equal(a["text_ids"], b["text_ids"])
        for a, b in zip(proc1_b, run(1, epoch=1)))


def test_loader_per_sample_rng_determinism(arrow_dir, tok):
    """Per-sample draw streams (data/rng.py): false-image draws are a
    pure function of (seed, epoch, dataset index) — identical runs
    produce identical batches under ANY worker count, thread or
    process pool, unlike the reference's shared global `random`
    stream (nondeterministic across torch workers)."""
    ds = ArrowDataset(
        arrow_dir, ["pixelbert"], 64,
        names=["coco_caption_karpathy_train"], text_column_name="caption",
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok,
        draw_false_image=1)
    def run(workers, procs=0, epoch=0):
        # fresh collator per run: its mask stream is sequential and
        # would otherwise carry across runs
        coll = MLMCollator(tok, seed=0)

        def cfn(samples):
            return collate(samples, coll, bucket_hw=(64, 64))

        l = DataLoader(ds, 2, cfn, shuffle=True, seed=1,
                       num_workers=workers, num_worker_procs=procs)
        l.set_epoch(epoch)
        return list(l)

    a = run(4)
    b = run(4)
    c = run(1)
    for ba, bb, bc in zip(a, b, c):
        for k in ba:
            if k.startswith("_"):
                continue
            np.testing.assert_array_equal(
                np.asarray(ba[k]), np.asarray(bb[k]), err_msg=k)
            if k == "false_image_0" or k == "image":
                np.testing.assert_array_equal(
                    np.asarray(ba[k]), np.asarray(bc[k]), err_msg=k)
    import os as _os
    if hasattr(_os, "fork"):
        d = run(2, procs=2)
        for ba, bd in zip(a, d):
            np.testing.assert_array_equal(
                np.asarray(ba["false_image_0"]),
                np.asarray(bd["false_image_0"]))
    # a new epoch draws differently
    e = run(4, epoch=1)
    assert any(
        not np.array_equal(x["false_image_0"], y["false_image_0"])
        for x, y in zip(a, e))


def test_loader_empty_shard_equalized(arrow_dir, tok):
    """Hosts whose strided shard is empty (dataset smaller than
    process_count) must still iterate the SAME number of batches as
    every other host — hosts run collectives in lockstep and the
    trainer assumes steps_per_epoch == len(loader) on every host —
    with every placeholder row masked invalid so the global sample
    count is unchanged."""
    ds = ArrowDataset(
        arrow_dir, ["pixelbert"], 64,
        names=["coco_caption_karpathy_train"], text_column_name="caption",
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok)
    coll = MLMCollator(tok, seed=0)

    def cfn(samples):
        return collate(samples, coll, bucket_hw=(64, 64))

    n = len(ds)
    pc = n + 5                      # some hosts get an empty shard
    loaders = [DataLoader(ds, 2, cfn, shuffle=False, seed=1,
                          process_index=i, process_count=pc,
                          drop_last=False)
               for i in range(pc)]
    assert len({len(l) for l in loaders}) == 1
    total_valid = 0
    for i, l in enumerate(loaders):
        batches = list(l._batches())
        assert len(batches) == len(l) > 0
        v = sum(int(valid.sum()) for _, _, valid in batches)
        assert v == (1 if i < n else 0)
        total_valid += v
        for _, idx, _ in batches:   # placeholder indices must be decodable
            assert (0 <= idx).all() and (idx < n).all()
    assert total_valid == n         # each sample counted exactly once
    # drop_last mode: everyone uniformly empty when n < pc*bs
    dl = [DataLoader(ds, 2, cfn, shuffle=False, seed=1, process_index=i,
                     process_count=pc, drop_last=True) for i in range(pc)]
    assert {len(l) for l in dl} == {0}


def test_sample_seed_no_epoch_aliasing():
    """sample_seed's index term must exceed any dataset length:
    (epoch, index) and (epoch+1, index-M) collided under the old
    M=1_000_003 multiplier, replaying an adjacent-epoch neighbour's
    exact augmentation stream on >1M-sample corpora."""
    from rmcl_tpu.data.rng import sample_seed
    seen = {}
    for e in range(3):
        for i in [0, 1, 1_000_003, 2_000_006, 10_000_000, 2 ** 32]:
            s = sample_seed(7, e, i)
            assert s not in seen, (e, i, seen[s])
            seen[s] = (e, i)
    assert sample_seed(7, 1, 0) != sample_seed(7, 0, 1_000_003)


def test_batch_seed_no_aliasing_and_role_separation():
    """batch_seed (collate-time MLM mask streams) must be collision-free
    across (epoch, batch index, loader role): the earlier flat
    ``epoch*10_007 + batch`` scheme replayed identical mask streams for
    epoch e batch k+10_007 and epoch e+1 batch k (real pretraining
    epochs have ~20k batches), and train/val loaders sharing cfg.seed
    collided outright."""
    from rmcl_tpu.data.rng import batch_seed
    seen = {}
    for role in (0, 1, 2):
        for e in range(3):
            for k in [0, 1, 10_007, 20_014, 1_000_000, 2 ** 32]:
                s = batch_seed(7, e, k, role)
                assert s not in seen, ((role, e, k), seen[s])
                seen[s] = (role, e, k)
    # the historical aliasing pair, explicitly
    assert batch_seed(7, 1, 0) != batch_seed(7, 0, 10_007)
    # train epoch-0 vs val (stuck at epoch 0) same batch index
    assert batch_seed(7, 0, 3, role=0) != batch_seed(7, 0, 3, role=1)


def test_loader_resume_replays_exact_mlm_masks(arrow_dir, tok):
    """Mid-epoch resume (set_epoch(e, skip_batches=k)) must replay the
    SAME MLM masks the uninterrupted run produced for batches k.. —
    collate RNG is a pure function of batch position (data/rng.py
    batch_rng), not a sequential stream whose position depends on how
    many batches were decoded before."""
    ds = ArrowDataset(
        arrow_dir, ["pixelbert"], 64,
        names=["coco_caption_karpathy_train"], text_column_name="caption",
        max_text_len=12, bucket_hw=(64, 64), tokenizer=tok)

    def make_loader():
        coll = MLMCollator(tok, seed=0, whole_word=True)

        def cfn(samples):
            return collate(samples, coll, bucket_hw=(64, 64))

        return DataLoader(ds, 2, cfn, shuffle=True, seed=1, num_workers=2)

    full = list(make_loader())
    assert len(full) >= 2
    resumed_loader = make_loader()
    resumed_loader.set_epoch(0, skip_batches=1)
    resumed = list(resumed_loader)
    assert len(resumed) == len(full) - 1
    for bf, br in zip(full[1:], resumed):
        for k in bf:
            np.testing.assert_array_equal(
                np.asarray(bf[k]), np.asarray(br[k]), err_msg=k)
    # and masks are actually live (some position masked somewhere)
    assert any((np.asarray(b["text_labels_mlm"]) != -100).any()
               for b in full)
