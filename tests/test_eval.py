"""Eval-layer tests: metric accumulators, official VQA accuracy, recall
math, submission writing, and an end-to-end fast_dev_run Trainer smoke."""

import io
import json
import os

import numpy as np
import pyarrow as pa
import pytest
from PIL import Image

from rmcl_tpu.core.config import build_config, loss_names
from rmcl_tpu.eval.metrics import Accuracy, MetricBag, Scalar, VQAScore, change_rate
from rmcl_tpu.eval.retrieval import recall_at_k
from rmcl_tpu.eval.vqa import VQASubmissionWriter, vqa_accuracy


def test_accuracy_ignores_minus100():
    m = Accuracy()
    logits = np.array([[2.0, 1.0], [0.0, 3.0], [5.0, 0.0]])
    target = np.array([0, 1, -100])
    m.update(logits, target)
    assert m.compute() == 1.0
    m.update(logits, np.array([1, 0, -100]))
    assert m.compute() == 0.5


def test_vqa_score_soft():
    m = VQAScore()
    logits = np.array([[0.1, 5.0, 0.0]])
    targets = np.array([[0.0, 0.6, 1.0]])
    m.update(logits, targets)
    np.testing.assert_allclose(m.compute(), 0.6)


def test_change_rate():
    assert change_rate([1, 2, 3], [1, 0, 3]) == pytest.approx(1 / 3)


def test_metric_bag_nlvr2():
    bag = MetricBag(loss_names({"nlvr2": 1}))
    bag.update({
        "nlvr2_loss": np.float32(0.5),
        "nlvr2_logits": np.array([[0.0, 2.0], [3.0, 0.0]]),
        "nlvr2_labels": np.array([1, 0]),
    })
    out = bag.epoch_wrapup("val")
    assert out["nlvr2_accuracy"] == 1.0
    assert out["val/the_metric"] == 1.0
    # reset happened
    out2 = bag.epoch_wrapup("val")
    assert out2["nlvr2_accuracy"] == 0.0


def test_official_vqa_accuracy():
    anns = [{
        "question_id": 1,
        "answer_type": "yes/no",
        "answers": [{"answer": "yes"}] * 8 + [{"answer": "no"}] * 2,
    }]
    res = vqa_accuracy({1: "yes"}, anns)
    # leave-one-out: 8 subsets with 7 or 8 'yes' -> 1.0; always >= 3 matches
    assert res["overall"] == 100.0
    res2 = vqa_accuracy({1: "no"}, anns)
    assert 0 < res2["overall"] < 100.0
    # normalization: "Yes!" == "yes"
    res3 = vqa_accuracy({1: "yes!"}, anns)
    assert res3["overall"] == 100.0


def test_submission_writer(tmp_path):
    w = VQASubmissionWriter({0: "yes", 1: "no"}, out_dir=str(tmp_path),
                            model_name="m")
    w.update([11, 12], np.array([[5.0, 0.0], [0.0, 5.0]]))
    path = w.finalize()
    with open(path) as fp:
        data = json.load(fp)
    assert data == [{"question_id": 11, "answer": "yes"},
                    {"question_id": 12, "answer": "no"}]


def test_recall_at_k_perfect_and_random():
    # 4 images, 8 texts (2 per image); scores = identity-ish blocks
    iids = np.array([0, 1, 2, 3])
    tiids = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    scores = np.full((4, 8), -10.0, np.float32)
    for i in range(4):
        scores[i, 2 * i] = 5.0
        scores[i, 2 * i + 1] = 4.0
    r = recall_at_k(scores, iids, tiids)
    assert r == (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    # anti-diagonal: R@1 should be 0 for ir and tr
    scores2 = np.zeros((4, 8), np.float32)
    for i in range(4):
        scores2[i, (2 * i + 2) % 8] = 5.0
    r2 = recall_at_k(scores2, iids, tiids)
    assert r2[0] < 1.0 and r2[3] < 1.0


# ---------------------------------------------------- Trainer smoke (e2e)
def _write_caption_arrow(d, n=8):
    def png(seed):
        img = Image.fromarray(np.random.RandomState(seed).randint(
            0, 255, (40, 48, 3), np.uint8))
        b = io.BytesIO()
        img.save(b, format="PNG")
        return b.getvalue()

    rows = {
        "image": [png(i) for i in range(n)],
        "caption": [["a dog running in the park"] for _ in range(n)],
        "image_id": [f"{i}.jpg" for i in range(n)],
        "split": ["train"] * n,
    }
    t = pa.table(rows)
    for name in ("coco_caption_karpathy_train", "coco_caption_karpathy_test"):
        with pa.OSFile(os.path.join(d, f"{name}.arrow"), "wb") as f:
            with pa.RecordBatchFileWriter(f, t.schema) as w:
                w.write_table(t)


def test_trainer_fast_dev_run(tmp_path):
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow))
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    cfg = build_config(
        "task_mlm_itm",
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=3, warmup_steps=0, batch_size=4,
        draw_false_image=1, num_workers=2, fast_dev_run=True,
        max_image_len=-1, log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab)
    tr.setup()
    ts = tr.fit()
    assert int(ts.step) >= 1
    assert tr.ckpt.has("last")
    # resume path
    restored = tr.ckpt.restore(tr.ts, "last")
    assert int(restored.step) == int(ts.step)


def test_trainer_resume_from_last(tmp_path):
    """A FRESH Trainer pointed at the old workdir with resume_from
    restores `last` and continues counting optimizer steps from there
    (reference `resume_from_checkpoint`, run.py:108) — including the
    re-run-into-existing-workdir checkpoint naming."""
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow))
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    kw = dict(
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, warmup_steps=0, batch_size=4,
        draw_false_image=1, num_workers=2, max_image_len=-1,
        log_dir=str(tmp_path / "out"))
    cfg = build_config("task_mlm_itm", max_steps=2, **kw)
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab)
    tr.setup()
    ts = tr.fit()
    assert int(ts.step) == 2

    cfg2 = build_config("task_mlm_itm", max_steps=4, resume_from="last",
                        **kw)
    tr2 = Trainer(cfg2, workdir=cfg2.log_dir, vocab_path=vocab)
    tr2.setup()
    assert tr2.steps_done == 2          # restored, not fresh
    ts2 = tr2.fit()
    assert int(ts2.step) == 4


def test_compute_irtr_recall_e2e(tmp_path):
    """Recall evaluator over a synthetic arrow dataset with an irtr model."""
    import jax
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.eval.retrieval import compute_irtr_recall
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow), n=4)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    cfg = build_config(
        "task_finetune_irtr_coco",
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=2, warmup_steps=0, batch_size=8,
        draw_false_text=2, num_workers=2, max_image_len=-1,
        log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    r = compute_irtr_recall(tr, split="test", txt_chunk=4, verbose=False)
    assert len(r) == 6
    assert all(0.0 <= x <= 1.0 for x in r)
    # 4 images, 1 caption each, random net: r@10 >= r@5 >= r@1
    assert r[2] >= r[1] >= r[0]
    assert r[5] >= r[4] >= r[3]
    # with only 4 images, top-10 must contain the match
    assert r[2] == 1.0 and r[5] == 1.0


def test_comm_single_process():
    from rmcl_tpu.parallel.comm import (
        all_gather, gather, get_rank, get_world_size, reduce_dict,
        synchronize)
    assert get_world_size() == 1 and get_rank() == 0
    synchronize()
    assert all_gather({"a": 1}) == [{"a": 1}]
    assert gather([1, 2]) == [[1, 2]]
    out = reduce_dict({"x": 2.0, "y": 4.0})
    assert out["x"] == 2.0 and out["y"] == 4.0


def test_metric_logger(tmp_path):
    from rmcl_tpu.train.logging import MetricLogger
    lg = MetricLogger(str(tmp_path))
    lg.log(1, {"loss": np.float32(2.0), "skip": "str"}, prefix="train/")
    lg.log(2, {"loss": 1.5})
    lg.close()
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert lines[0]["train/loss"] == 2.0
    assert lines[1]["loss"] == 1.5
    assert "skip" not in lines[0]


def test_vqa_test_submission_via_trainer(tmp_path):
    """CLI-equivalent: test_only VQA run writes the submission json."""
    import pyarrow as pa
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    def png(seed):
        img = Image.fromarray(np.random.RandomState(seed).randint(
            0, 255, (40, 48, 3), np.uint8))
        b = io.BytesIO(); img.save(b, format="PNG"); return b.getvalue()
    vrows = {
        "image": [png(i) for i in range(4)],
        "questions": [["is the dog big"] for _ in range(4)],
        "answers": [[["yes", "no"]] for _ in range(4)],
        "answer_labels": [[[0, 1]] for _ in range(4)],
        "answer_scores": [[[1.0, 0.3]] for _ in range(4)],
        "question_id": [[100 + i] for i in range(4)],
        "split": ["train"] * 4,
    }
    vt = pa.table(vrows)
    for name in ("vqav2_train", "vqav2_trainable_val", "vqav2_val"):
        with pa.OSFile(str(arrow / f"{name}.arrow"), "wb") as f:
            with pa.RecordBatchFileWriter(f, vt.schema) as w:
                w.write_table(vt)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "big", "is", "the"])

    cfg = build_config(
        "task_finetune_vqa",
        datasets=("vqa",), data_root=str(arrow), test_only=True,
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, vqav2_label_size=5, use_pallas_attention=False,
        compute_dtype="float32", drop_rate=0.0, max_steps=2,
        warmup_steps=0, batch_size=8, num_workers=2, max_image_len=-1,
        log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    metrics = tr.validate(split="test")
    assert "vqa_score" in metrics
    sub = os.path.join(cfg.log_dir, "vqa_submit_finetune_vqa.json")
    assert os.path.exists(sub)
    data = json.load(open(sub))
    assert {d["question_id"] for d in data} == {100, 101, 102, 103}
    assert all(d["answer"] in ("yes", "no", "unknown") for d in data)


def test_trainer_load_path_torch_ckpt(tmp_path):
    """cfg.load_path pointing at a torch .ckpt loads converted weights
    (strict=False semantics: missing heads keep fresh init)."""
    import torch
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_compat import TorchViLT, _cfg as _ccfg
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow), n=4)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    tcfg = _ccfg({"itm": 1}, max_text_len=12, image_size=32, patch_size=16,
                 image_bucket_hw=(32, 48), vocab_size=64)
    torch.manual_seed(0)
    tm = TorchViLT(tcfg)
    ckpt = str(tmp_path / "init.ckpt")
    torch.save({"state_dict": tm.state_dict()}, ckpt)

    cfg = tcfg.replace(
        datasets=("coco",), data_root=str(arrow), load_path=ckpt,
        num_layers=tcfg.num_layers, max_steps=2, warmup_steps=0,
        batch_size=4, draw_false_image=1, num_workers=2,
        fast_dev_run=True, log_dir=str(tmp_path / "out"),
        loss_names=type(tcfg.loss_names)(
            {**tcfg.loss_names, "itm": 1.0}))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    # loaded pooler kernel matches the torch checkpoint exactly
    np.testing.assert_allclose(
        np.asarray(tr.ts.params["pooler"]["dense"]["kernel"]),
        tm.state_dict()["pooler.dense.weight"].numpy().T, rtol=1e-6)
    # itm head was NOT in the ckpt -> fresh init present
    assert "itm_score" in tr.ts.params


def test_attacked_irtr_recall_e2e(tmp_path):
    """Attacked recall: PGD-perturbed images actually get ranked."""
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.eval.retrieval import (
        compute_attacked_irtr_recall, compute_irtr_recall)
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow), n=3)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    cfg = build_config(
        "task_finetune_irtr_coco_randaug_attacked",
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=2, warmup_steps=0, batch_size=4,
        draw_false_text=2, num_workers=2, max_image_len=-1,
        adv_steps_img=1, loss_names=loss_names({"irtr_attacked": 1,
                                                "irtr": 1}),
        text_view=False, image_view=True,
        log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    tr.greedy = None
    clean = compute_irtr_recall(tr, split="test", txt_chunk=4,
                                verbose=False)
    attacked = compute_attacked_irtr_recall(
        tr, split="test", txt_chunk=4, verbose=False,
        text_view=False, image_view=True, max_texts=None)
    assert len(attacked) == 6
    assert all(0.0 <= x <= 1.0 for x in attacked)


def test_trainer_load_path_orbax_dir(tmp_path):
    """load_path pointing at an orbax dir restores trained params."""
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow))
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    cfg = build_config(
        "task_mlm_itm",
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=2, warmup_steps=0, batch_size=4,
        draw_false_image=1, num_workers=2, fast_dev_run=True,
        max_image_len=-1, log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    tr.fit()
    trained = np.asarray(tr.ts.params["pooler"]["dense"]["kernel"])

    ckpt_dir = os.path.join(tr.workdir, "last")
    cfg2 = cfg.replace(load_path=ckpt_dir, test_only=True)
    tr2 = Trainer(cfg2, workdir=str(tmp_path / "out2"), vocab_path=vocab,
                  use_mesh=False)
    tr2.setup()
    np.testing.assert_allclose(
        np.asarray(tr2.ts.params["pooler"]["dense"]["kernel"]), trained)


def test_train_metrics_accumulate_from_scalars():
    """Train-step rets (scalars only) must still feed the metric bag."""
    bag = MetricBag(loss_names({"mlm": 1, "itm": 1}))
    bag.update({"mlm_loss": np.float32(2.0), "itm_loss": np.float32(0.5),
                "itm_wpa_loss": np.float32(0.01),
                "mlm_step_accuracy": np.float32(0.25),
                "itm_step_accuracy": np.float32(0.75)})
    out = bag.epoch_wrapup("train")
    assert out["mlm_loss"] == 2.0
    assert out["itm_loss"] == 0.5
    assert out["mlm_step_accuracy"] == 0.25
    assert out["itm_step_accuracy"] == 0.75


def test_trainer_benign_augmentation_moco(tmp_path):
    """augmentation=True swaps the attacks for EDA text + SimCLR image
    views (reference objectives.py:277-279, 320-321)."""
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow))
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the", "in", "a"])

    cfg = build_config(
        "task_moco",
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, num_negative=8, use_pallas_attention=False,
        compute_dtype="float32", drop_rate=0.0, max_steps=2,
        warmup_steps=0, batch_size=4, num_workers=2, fast_dev_run=True,
        max_image_len=-1, augmentation=True, text_view=True,
        image_view=True, type_txt_augm=("EDA",),
        log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    assert tr.text_augment is not None and tr.image_augment is not None
    assert tr.greedy is None
    ts = tr.fit()
    assert int(ts.step) >= 1
    # benign views feed real losses
    tm_keys = set(tr.val_metrics.metrics) | set(tr.val_metrics.extra)
    vm = tr.validate()
    assert np.isfinite(vm["moco_loss"])
    assert "attacked_txt_loss" in vm and "attacked_img_loss" in vm


def test_attacked_recall_effectiveness(tmp_path):
    """The attacked-recall proxy ACTUALLY lowers recall (PARITY.md
    divergence #9): fit rank_output exactly to the clean pair features
    (clean recall = 1.0 by construction), then the PGD image attack must
    strictly degrade it.  Also regression-guards the B=1 IRTR PGD
    (in-batch softmax over one class has zero gradient)."""
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.eval.retrieval import (
        compute_attacked_irtr_recall, compute_irtr_recall)
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    caps = ["red dog running fast", "blue cat sleeping quietly",
            "green bird flying high", "small fish swimming deep"]

    def png(seed):
        img = Image.fromarray(np.random.RandomState(seed).randint(
            0, 255, (40, 48, 3), np.uint8))
        b = io.BytesIO()
        img.save(b, format="PNG")
        return b.getvalue()

    rows = {"image": [png(i) for i in range(4)],
            "caption": [[c] for c in caps],
            "image_id": [f"{i}.jpg" for i in range(4)],
            "split": ["train"] * 4}
    t = pa.table(rows)
    for name in ("coco_caption_karpathy_train",
                 "coco_caption_karpathy_test"):
        with pa.OSFile(os.path.join(str(arrow), f"{name}.arrow"), "wb") as f:
            with pa.RecordBatchFileWriter(f, t.schema) as w:
                w.write_table(t)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, sorted({w for c in caps for w in c.split()}))

    cfg = build_config(
        "task_finetune_irtr_coco_randaug_attacked",
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=1, warmup_steps=0, batch_size=4,
        draw_false_text=2, num_workers=2, max_image_len=-1,
        loss_names=loss_names({"irtr": 1, "irtr_attacked": 1}),
        text_view=False, image_view=True, get_recall_metric=False,
        adv_steps_img=5, adv_lr_img=0.3, adv_max_norm_img=0.5,
        log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    tr.greedy = None

    # ---- least-squares rank_output: score(img_i, txt_j) = +1 iff i==j
    import jax.numpy as jnp
    dset = tr.dm.make_no_false_dset("coco", "test")
    model, params = tr.model, tr.ts.params
    n = len(dset)
    H, W = cfg.image_bucket_hw
    row_to_sample = {}
    for i, (r, _) in dset.index_mapper.items():
        row_to_sample.setdefault(r, i)
    feats, y = [], []
    for ti in range(n):
        txt = dset.get_text(ti)
        ids = np.asarray(txt["text"][1]["input_ids"])[None]
        masks = np.asarray(txt["text"][1]["attention_mask"])[None]
        for r in range(n):
            img = dset.get_image(row_to_sample[r])["image"][0]
            if img.dtype == np.uint8:   # u8 wire format (PARITY #26)
                img = ((img.astype(np.float32) / 255.0) - 0.5) / 0.5
            canvas = np.zeros((1, H, W, 3), np.float32)
            canvas[0, :img.shape[0], :img.shape[1]] = img[:H, :W]
            b = {"image": jnp.asarray(canvas), "text_ids": jnp.asarray(ids),
                 "text_masks": jnp.asarray(masks),
                 "text_labels": jnp.full_like(jnp.asarray(ids), -100)}
            inf = model.infer(params, b, deterministic=True)
            feats.append(np.asarray(inf["cls_feats"])[0])
            y.append(1.0 if txt["img_index"] == r else -1.0)
    C = np.concatenate([np.stack(feats), np.ones((len(feats), 1))], axis=1)
    w, *_ = np.linalg.lstsq(C, np.asarray(y), rcond=None)
    tr.ts = tr.ts._replace(params=dict(
        params, rank_output={"kernel": jnp.asarray(w[:-1][:, None],
                                                   jnp.float32),
                             "bias": jnp.asarray(w[-1:], jnp.float32)}))

    clean = compute_irtr_recall(tr, split="test", txt_chunk=4, verbose=False)
    assert clean == (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    attacked = compute_attacked_irtr_recall(
        tr, split="test", txt_chunk=4, verbose=False,
        text_view=False, image_view=True, max_texts=None)
    assert sum(attacked) < sum(clean)   # attack effectiveness
    assert attacked[0] < clean[0]       # ir_r1 strictly degraded

def _write_synonym_vectors(path):
    rng = np.random.RandomState(0)
    groups = [["dog", "puppy"], ["park", "garden"], ["running", "sprinting"]]
    vecs = {}
    for group in groups:
        base = rng.randn(16)
        for w in group:
            vecs[w] = base + 0.05 * rng.randn(16)
    for w in ("the", "in", "a"):
        vecs[w] = rng.randn(16)
    with open(path, "w") as f:
        for w, v in vecs.items():
            f.write(w + " " + " ".join(f"{x:.5f}" for x in v) + "\n")


def test_attacked_recall_text_view_attacker_selection(tmp_path):
    """Attacked recall with text_view=True always attacks through an
    IRTR-shaped greedy attacker (reference objectives.py:1410), even
    when the trainer's attacker belongs to a different framework — the
    production case is moco pretraining with get_recall_metric, where
    trainer.greedy is GreedyAttackMoco and its extras layout would not
    match the IRTR (text_repr, temperature, sample_ids) tuple.  The
    rebuilt attacker shares tokenizer+synonyms, so the recall must be
    IDENTICAL to running with the native IRTR attacker."""
    from rmcl_tpu.attacks import greedy as G
    from rmcl_tpu.attacks.greedy_fused import FusedGreedyAttack
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.eval.retrieval import compute_attacked_irtr_recall
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow), n=3)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "puppy", "running", "sprinting",
                            "park", "garden", "the", "in", "a"])
    emb = str(tmp_path / "vectors.txt")
    _write_synonym_vectors(emb)

    cfg = build_config(
        "task_finetune_irtr_coco_randaug_attacked",
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=1, warmup_steps=0, batch_size=4,
        draw_false_text=2, num_workers=2, max_image_len=-1,
        loss_names=loss_names({"irtr_attacked": 1, "irtr": 1}),
        text_view=True, image_view=False,
        embedding_path=emb, n_candidates=2, max_loops=2,
        greedy_impl="fused",
        log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    assert tr.greedy is not None
    base = getattr(tr.greedy, "base", tr.greedy)
    assert isinstance(base, G.GreedyAttackIrtr)   # native IRTR attacker

    native = compute_attacked_irtr_recall(
        tr, split="test", txt_chunk=4, verbose=False,
        text_view=True, image_view=False, max_texts=None)
    assert len(native) == 6
    assert all(0.0 <= x <= 1.0 for x in native)

    # swap in a MISMATCHED (moco) attacker on the same tables: the
    # eval must rebuild an IRTR attacker and reproduce the same recall
    tr.greedy = FusedGreedyAttack(
        G.GreedyAttackMoco(cfg, tr.model, base.tokenizer, base.synonyms))
    rebuilt = compute_attacked_irtr_recall(
        tr, split="test", txt_chunk=4, verbose=False,
        text_view=True, image_view=False, max_texts=None)
    assert rebuilt == native


@pytest.mark.parametrize("fuse_step,greedy_impl", [
    (True, "fused"),     # production default: one-program attack+step
    (False, "fused"),    # pipeline with the on-device fused attacker
    (False, "host"),     # reference-style host orchestration
])
def test_trainer_moco_greedy_attack_e2e(tmp_path, fuse_step, greedy_impl):
    """Trainer with a REAL greedy text attacker (counter-fitted
    vectors): the one-program fused attack+step path, the 3-program
    pipeline, and the host-orchestrated reference scheduling all train
    and validate end-to-end, with attack telemetry in the metrics."""
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow))
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "puppy", "running", "sprinting",
                            "park", "garden", "the", "in", "a"])
    emb = str(tmp_path / "vectors.txt")
    _write_synonym_vectors(emb)

    cfg = build_config(
        "task_moco",
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, num_negative=8, use_pallas_attention=False,
        compute_dtype="float32", drop_rate=0.0, max_steps=2,
        warmup_steps=0, batch_size=4, num_workers=2, fast_dev_run=True,
        max_image_len=-1, text_view=True, image_view=True,
        adv_steps_img=1, adv_lr_img=0.05, adv_max_norm_img=0.005,
        embedding_path=emb, n_candidates=2, max_loops=2,
        fuse_attack_step=fuse_step, greedy_impl=greedy_impl,
        log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    assert tr.greedy is not None
    assert tr._fused_step is fuse_step

    # one manual step to inspect the batch contract + step metrics
    import jax
    from rmcl_tpu.train.loop import _device_batch
    loader = tr.dm.train_loader(tr.per_host_batch)
    loader.set_epoch(0)
    raw = next(iter(loader))
    batch = tr._attach_text_attack(raw)
    if fuse_step:
        assert any(k.startswith("gw_") for k in batch)  # tables attached
    else:
        assert "attacked_text_ids" in batch  # device-resident ids kept
    db = _device_batch(batch, tr.mesh)
    if not fuse_step:
        assert "attacked_text_ids" in db  # not dropped by the filter
    ts2, metrics = tr.step_fn(tr.ts, db, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["moco_loss"]))
    assert np.isfinite(float(metrics["attacked_txt_loss"]))
    if fuse_step:
        assert "num_changes" in metrics and "change_rate" in metrics
    tr.ts = ts2

    ts = tr.fit()
    assert int(ts.step) >= 1
    vm = tr.validate()
    assert np.isfinite(vm["moco_loss"])
    assert "attacked_txt_loss" in vm


def test_trainer_nlvr2_attacked_greedy_e2e(tmp_path):
    """Trainer wiring for a NON-moco attacked framework: NLVR2 finetune
    with the real greedy attacker through the one-program fused path
    (labels extras in-graph, two-image batch keys, telemetry in step
    metrics)."""
    import json

    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.data.writers import make_arrow_nlvr2
    from rmcl_tpu.train.loop import Trainer

    raw = tmp_path / "raw"
    (raw / "nlvr2" / "data").mkdir(parents=True)
    for split, sub in (("train", "images/train/0"), ("dev", "dev")):
        (raw / sub).mkdir(parents=True)
        rows = []
        for i in range(4):
            iden = f"{split}-{i}-0"
            rows.append({"identifier": f"{iden}-0", "directory": "0",
                         "sentence": f"the dog runs in the park {i}",
                         "label": "True" if i % 2 == 0 else "False"})
            img = Image.fromarray(np.random.RandomState(i).randint(
                0, 255, (40, 40, 3), np.uint8))
            img.save(raw / sub / f"{iden}-img0.png")
            img.save(raw / sub / f"{iden}-img1.png")
        with open(raw / "nlvr2" / "data" / f"{split}.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
    arrow = tmp_path / "arrow"
    arrow.mkdir()
    make_arrow_nlvr2(str(raw), str(arrow))

    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "puppy", "runs", "park", "the", "in"])
    emb = str(tmp_path / "vectors.txt")
    _write_synonym_vectors(emb)

    cfg = build_config(
        "task_finetune_nlvr2_randaug_attacked",
        datasets=("nlvr2",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False,
        compute_dtype="float32", drop_rate=0.0, max_steps=2,
        warmup_steps=0, batch_size=2, num_workers=2, fast_dev_run=True,
        max_image_len=-1, text_view=True, image_view=True,
        adv_steps_img=1, adv_lr_img=0.05, adv_max_norm_img=0.005,
        embedding_path=emb, n_candidates=2, max_loops=2,
        log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab, use_mesh=False)
    tr.setup()
    assert tr.greedy is not None
    assert tr._fused_step  # one-program path active for nlvr2_attacked

    import jax
    from rmcl_tpu.train.loop import _device_batch
    loader = tr.dm.train_loader(tr.per_host_batch)
    loader.set_epoch(0)
    batch = tr._attach_text_attack(next(iter(loader)))
    assert any(k.startswith("gw_") for k in batch)
    db = _device_batch(batch, tr.mesh)
    ts2, metrics = tr.step_fn(tr.ts, db, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["nlvr2_original_loss"]))
    assert np.isfinite(float(metrics["nlvr2_attacked_loss"]))
    assert "num_changes" in metrics


def _write_nlvr2_raw(tmp_path, n=8):
    """Synthetic NLVR2 raw tree (train+dev) -> arrow dir (deterministic
    pipeline: no false draws, no masking, pixelbert transform)."""
    import json

    from rmcl_tpu.data.writers import make_arrow_nlvr2

    raw = tmp_path / "raw"
    (raw / "nlvr2" / "data").mkdir(parents=True)
    for split, sub, rows_n in (("train", "images/train/0", n),
                               ("dev", "dev", 2)):
        (raw / sub).mkdir(parents=True)
        rows = []
        for i in range(rows_n):
            iden = f"{split}-{i}-0"
            rows.append({"identifier": f"{iden}-0", "directory": "0",
                         "sentence": f"the dog runs in the park {i}",
                         "label": "True" if i % 2 == 0 else "False"})
            img = Image.fromarray(np.random.RandomState(i).randint(
                0, 255, (40, 40, 3), np.uint8))
            img.save(raw / sub / f"{iden}-img0.png")
            img.save(raw / sub / f"{iden}-img1.png")
        with open(raw / "nlvr2" / "data" / f"{split}.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
    arrow = tmp_path / "arrow"
    arrow.mkdir()
    make_arrow_nlvr2(str(raw), str(arrow))
    return arrow


def _nlvr2_trainer(tmp_path, arrow, vocab, max_steps, resume=None,
                   workdir="out"):
    from rmcl_tpu.train.loop import Trainer

    cfg = build_config(
        "task_finetune_nlvr2",
        datasets=("nlvr2",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False,
        compute_dtype="float32", drop_rate=0.0, max_steps=max_steps,
        warmup_steps=0, batch_size=2, num_workers=2, max_image_len=-1,
        resume_from=resume, log_dir=str(tmp_path / workdir))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab,
                 use_mesh=False)
    tr.setup()
    return tr


def test_preemption_checkpoint_and_exact_resume(tmp_path):
    """Graceful preemption (SURVEY §5.3 — the reference has none):
    request_preemption() mid-epoch commits a 'last' checkpoint at the
    next step boundary and fit() exits without validating; a fresh
    Trainer with resume_from restores it, fast-forwards the interrupted
    epoch's loader past the already-trained batches, and — because
    per-step RNG keys fold in the micro-step index — the
    preempted+resumed run reproduces the uninterrupted run's final
    params EXACTLY (NLVR2 pipeline is host-deterministic: no false
    draws, no masking, pixelbert transform)."""
    from rmcl_tpu.data.tokenizer import make_tiny_vocab

    arrow = _write_nlvr2_raw(tmp_path)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "runs", "park", "the", "in"])

    # uninterrupted reference run: 4 steps (one 4-batch epoch)
    tr_a = _nlvr2_trainer(tmp_path, arrow, vocab, 4, workdir="a")
    ts_a = tr_a.fit()
    assert int(ts_a.step) == 4

    # preempted run: stop after micro-step 1 (mid-epoch)
    tr_b = _nlvr2_trainer(tmp_path, arrow, vocab, 4, workdir="b")
    orig_step = tr_b.step_fn

    def step_and_preempt(ts, db, rng):
        out = orig_step(ts, db, rng)
        tr_b.request_preemption()
        return out

    tr_b.step_fn = step_and_preempt
    ts_b = tr_b.fit()
    assert int(ts_b.step) == 1
    assert tr_b.ckpt.has("last")
    assert int(tr_b.ckpt.restore(tr_b.ts, "last").step) == 1

    # resumed run: restores step 1, trains exactly batches 2..4
    tr_c = _nlvr2_trainer(tmp_path, arrow, vocab, 4, resume="last",
                          workdir="b")
    assert tr_c.steps_done == 1
    ts_c = tr_c.fit()
    assert int(ts_c.step) == 4

    import jax

    flat_a = jax.tree_util.tree_leaves(ts_a.params)
    flat_c = jax.tree_util.tree_leaves(ts_c.params)
    for a, c in zip(flat_a, flat_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_sigterm_sets_preemption_flag(tmp_path):
    """The guard installed around fit() turns SIGTERM into a graceful
    stop request instead of killing the process, and restores the
    previous handler on exit."""
    import os
    import signal

    from rmcl_tpu.data.tokenizer import make_tiny_vocab

    arrow = _write_nlvr2_raw(tmp_path, n=2)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "runs", "park", "the", "in"])
    tr = _nlvr2_trainer(tmp_path, arrow, vocab, 1)

    before = signal.getsignal(signal.SIGTERM)
    with tr._sigterm_guard():
        os.kill(os.getpid(), signal.SIGTERM)
        assert tr._preempt_requested          # alive and flagged
    assert signal.getsignal(signal.SIGTERM) is before


def test_trainer_grad_accumulation_wiring(tmp_path):
    """Trainer derives accumulate_grad_batches = batch_size //
    (per_device_batchsize * devices * hosts) like reference
    run.py:86-88 and wires optax.MultiSteps: ts.step counts
    micro-batches while the optimizer applies one update per cycle."""
    import optax
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow), n=16)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    cfg = build_config(
        "task_mlm_itm",
        datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=12,
        vocab_size=64, use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=1, warmup_steps=0, max_epoch=1,
        per_device_batchsize=1, batch_size=16,   # 8 virtual devices -> accum 2
        draw_false_image=1, num_workers=2, max_image_len=-1,
        log_dir=str(tmp_path / "out"))
    tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab)
    tr.setup()
    assert tr.accum_steps == 2
    assert isinstance(tr.ts.opt_state, optax.MultiStepsState)
    tr.fit()   # max_steps=1 optimizer step -> 2 micro-batches
    assert int(tr.ts.step) == 2
    assert int(tr.ts.opt_state.gradient_step) == 1
    assert int(tr.ts.opt_state.mini_step) == 0


def test_recall_text_bucket_exact(tmp_path):
    """The recall text bucket (eval/retrieval.py: rank at the /8 bucket
    of the real caption lengths) must not change a single pair score —
    the dropped rows are all-pad and attention-masked."""
    import jax
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.eval.retrieval import compute_irtr_recall
    from rmcl_tpu.train.loop import Trainer

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow), n=4)
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    def run(bucket):
        cfg = build_config(
            "task_finetune_irtr_coco",
            datasets=("coco",), data_root=str(arrow),
            hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
            image_size=32, image_bucket_hw=(32, 48),
            # captions are ~4 tokens: the bucket engages at 8 < 24
            max_text_len=24,
            vocab_size=64, use_pallas_attention=False,
            compute_dtype="float32", drop_rate=0.0, max_steps=2,
            warmup_steps=0, batch_size=8, draw_false_text=2,
            num_workers=2, max_image_len=-1,
            eval_text_bucket=bucket,
            log_dir=str(tmp_path / f"out{int(bucket)}"))
        tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab,
                     use_mesh=False)
        tr.setup()
        return compute_irtr_recall(tr, split="test", txt_chunk=4,
                                   verbose=False)

    r_on = run(True)
    r_off = run(False)
    assert r_on == r_off


def test_trainer_text_bucket_parity(tmp_path):
    """The train/eval text bucket (train/loop.py:bucket_text_batch) is a
    pure perf transform: a short-caption fit at max_text_len=24 with the
    bucket engaged (Tb=8) matches the unbucketed run's params and losses
    (fp32 CPU; the dropped columns are all-pad/-100 and masked), and the
    bucket is disabled for text_view configs where attacked ids arrive
    at full width."""
    from rmcl_tpu.data.tokenizer import make_tiny_vocab
    from rmcl_tpu.train.loop import Trainer, bucket_text_batch

    arrow = tmp_path / "arrow"
    arrow.mkdir()
    _write_caption_arrow(str(arrow))
    vocab = str(tmp_path / "vocab.txt")
    make_tiny_vocab(vocab, ["dog", "running", "park", "the"])

    def run(bucket):
        # pin the GLOBAL random stream: false-image draws use the
        # `random` module, whose state would otherwise carry from the
        # first run into the second (different itm negatives, nothing
        # to do with bucketing)
        import random as _r
        _r.seed(123)
        np.random.seed(123)
        cfg = build_config(
            "task_mlm_itm",
            datasets=("coco",), data_root=str(arrow),
            hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
            image_size=32, image_bucket_hw=(32, 48), max_text_len=24,
            vocab_size=64, use_pallas_attention=False,
            compute_dtype="float32", drop_rate=0.0, max_steps=3,
            warmup_steps=0, batch_size=4, draw_false_image=1,
            # ONE worker thread: the false-image draws consume the
            # global `random` stream, whose interleaving across pool
            # threads is racy — irrelevant to bucketing but fatal to a
            # run-vs-run parity assertion
            num_workers=1, max_image_len=-1,
            train_text_bucket=bucket,
            log_dir=str(tmp_path / f"out{int(bucket)}"))
        tr = Trainer(cfg, workdir=cfg.log_dir, vocab_path=vocab,
                     use_mesh=False)
        tr.setup()
        assert tr._text_bucket == bucket
        losses = []
        orig = tr.step_fn

        def spy(ts, db, rng):
            ts, m = orig(ts, db, rng)
            losses.append(float(m["total_loss"]))
            return ts, m

        tr.step_fn = spy
        ts = tr.fit()
        return ts, losses

    import jax

    ts_on, loss_on = run(True)
    ts_off, loss_off = run(False)
    # first-step loss is semantics: any real mask-invariance bug shows
    # up here at 1e-2+; the later-step/params tolerance is looser
    # because the S-extent change regroups fp32 reduction orders and
    # AdamW's grad/sqrt(v) chaotically amplifies those last-ulp diffs
    np.testing.assert_allclose(loss_on[0], loss_off[0], rtol=1e-5)
    np.testing.assert_allclose(loss_on, loss_off, rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4),
        ts_on.params, ts_off.params)

    # unit: the slicer touches exactly the text-grid keys
    b = {"text_ids": np.zeros((2, 24), np.int32),
         "text_masks": np.concatenate(
             [np.ones((2, 5), np.int32), np.zeros((2, 19), np.int32)], 1),
         "text_labels_mlm": np.full((2, 24), -100, np.int32),
         "image": np.zeros((2, 8, 8, 3), np.float32),
         "qid": np.arange(2)}
    out = bucket_text_batch(b, 24)
    assert out["text_ids"].shape == (2, 8)
    assert out["text_labels_mlm"].shape == (2, 8)
    assert out["image"].shape == (2, 8, 8, 3)
    assert out["qid"].shape == (2,)

    # gate: text_view configs keep full width
    cfg_tv = build_config(
        "task_moco", datasets=("coco",), data_root=str(arrow),
        hidden_size=32, num_heads=2, num_layers=1, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=24,
        vocab_size=64, use_pallas_attention=False,
        compute_dtype="float32", drop_rate=0.0, max_steps=1,
        warmup_steps=0, batch_size=4, num_workers=2, max_image_len=-1,
        text_view=True, num_negative=16,
        log_dir=str(tmp_path / "outtv"))
    tr = Trainer(cfg_tv, workdir=cfg_tv.log_dir, vocab_path=vocab,
                 use_mesh=False)
    tr.setup()
    assert tr._text_bucket is False


def test_val_loss_exact_under_wrap_padding():
    """PARITY #10 closure: a wrap-padded final batch (static-shape val
    loader, data/loader.py) must produce IDENTICAL val `*_loss` scalars
    to an exact-size final batch (torch's ragged last batch, reference
    base_dataset.py:184-206).  Exercises the per-sample loss
    decomposition end-to-end: the eval step emits `{key}_ps` (+ `_wt`
    for token-weighted losses) and MetricBag recombines over the valid
    rows only."""
    import jax
    import jax.numpy as jnp

    from rmcl_tpu.core.config import build_config, loss_names
    from rmcl_tpu.eval.metrics import MetricBag
    from rmcl_tpu.train.step import create_train_state, make_eval_step
    from tests.conftest import make_fake_batch

    cfg = build_config(
        hidden_size=32, num_heads=2, num_layers=2, patch_size=16,
        image_size=32, image_bucket_hw=(32, 48), max_text_len=10,
        vocab_size=64, vqav2_label_size=8,
        loss_names=loss_names({"mlm": 1, "vqa": 1, "nlvr2": 1}),
        use_pallas_attention=False, compute_dtype="float32",
        drop_rate=0.0, max_steps=10)
    model, ts, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    eval_fn = make_eval_step(cfg, model)

    B, real = 6, 4
    b = make_fake_batch(cfg, batch=B)
    labels = np.full_like(b["text_ids"], -100)
    labels[:, 2:5] = b["text_ids"][:, 2:5]
    # unequal per-sample token counts: sample 0 has an extra masked
    # position, so token-weighted recombination is actually exercised
    labels[0, 6] = b["text_ids"][0, 6]
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["text_ids_mlm"] = batch["text_ids"]
    batch["text_labels_mlm"] = jnp.asarray(labels)
    t = np.zeros((B, 8), np.float32)
    t[np.arange(B), np.arange(B) % 8] = 1.0
    batch["vqa_targets"] = jnp.asarray(t)
    batch["image_1"] = jnp.asarray(make_fake_batch(cfg, batch=B,
                                                   seed=3)["image"])
    batch["answers"] = jnp.asarray(np.arange(B) % 2, jnp.int32)

    rng = jax.random.PRNGKey(1)
    ret_full = {k: np.asarray(v)
                for k, v in eval_fn(ts.params, ts.state, batch, rng).items()
                if hasattr(v, "ndim")}

    # exact-size final batch: same rows, no padding
    small = {k: (v[:real] if getattr(v, "ndim", 0) >= 1
                 and v.shape[0] == B else v) for k, v in batch.items()}
    ret_small = {k: np.asarray(v)
                 for k, v in eval_fn(ts.params, ts.state, small,
                                     rng).items() if hasattr(v, "ndim")}

    valid = np.zeros((B,), bool)
    valid[:real] = True
    bag_pad = MetricBag(cfg.loss_names)
    bag_pad.update(ret_full, valid=valid)
    bag_ex = MetricBag(cfg.loss_names)
    bag_ex.update(ret_small)

    out_pad = bag_pad.epoch_wrapup("val")
    out_ex = bag_ex.epoch_wrapup("val")
    for key in ("mlm_loss", "vqa_loss", "nlvr2_loss"):
        np.testing.assert_allclose(out_pad[key], out_ex[key], rtol=1e-6,
                                   err_msg=key)
