"""REAL process_count>1 coverage: two OS processes, 4 virtual CPU
devices each, joined by jax.distributed into one 8-device mesh.

Exercises the paths no single-process test can reach (SURVEY.md §5.8,
reference run.py:92-112 DDP semantics):
  * jax.distributed.initialize + cross-process device discovery
  * host_local_array_to_global_array batch assembly (the reference's
    DistributedSampler rank split)
  * XLA-inserted cross-process gradient reduction inside the jitted
    RMCL step (loss must be bitwise-identical on every process)
  * parallel/comm.py object all_gather + barrier over DCN
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_rmcl_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_mp_worker.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=root)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("MP_RESULT")]
        assert lines, f"no MP_RESULT in worker output:\n{out[-4000:]}"
        _, pid, l1, l2, ok = lines[0].split()
        results[int(pid)] = (float(l1), float(l2), int(ok))

    assert set(results) == {0, 1}
    # single-controller SPMD: every process computes the same global loss
    assert results[0][0] == results[1][0]
    assert results[0][1] == results[1][1]
    # the step actually trained (loss changed) and gathers worked
    assert results[0][0] != results[0][1]
    assert results[0][2] == 1 and results[1][2] == 1


def _make_eval_data(datadir):
    """VQA + caption arrow tables and a tiny vocab, shared by both
    worker processes."""
    import io

    import numpy as np
    import pyarrow as pa
    from PIL import Image

    from rmcl_tpu.data.tokenizer import make_tiny_vocab

    def png(seed):
        img = Image.fromarray(np.random.RandomState(seed).randint(
            0, 255, (40, 48, 3), np.uint8))
        b = io.BytesIO()
        img.save(b, format="PNG")
        return b.getvalue()

    vqa = os.path.join(datadir, "vqa")
    os.makedirs(vqa)
    vrows = {
        "image": [png(i) for i in range(8)],
        "questions": [["is the dog big"] for _ in range(8)],
        "answers": [[["yes", "no"]] for _ in range(8)],
        "answer_labels": [[[0, 1]] for _ in range(8)],
        "answer_scores": [[[1.0, 0.3]] for _ in range(8)],
        "question_id": [[100 + i] for i in range(8)],
        "split": ["train"] * 8,
    }
    vt = pa.table(vrows)
    for name in ("vqav2_train", "vqav2_trainable_val", "vqav2_val"):
        with pa.OSFile(os.path.join(vqa, f"{name}.arrow"), "wb") as f:
            with pa.RecordBatchFileWriter(f, vt.schema) as w:
                w.write_table(vt)

    coco = os.path.join(datadir, "coco")
    os.makedirs(coco)
    crows = {
        "image": [png(100 + i) for i in range(5)],
        "caption": [["a dog running in the park"] for _ in range(5)],
        "image_id": [f"{i}.jpg" for i in range(5)],
        "split": ["train"] * 5,
    }
    ct = pa.table(crows)
    for name in ("coco_caption_karpathy_train", "coco_caption_karpathy_test"):
        with pa.OSFile(os.path.join(coco, f"{name}.arrow"), "wb") as f:
            with pa.RecordBatchFileWriter(f, ct.schema) as w:
                w.write_table(ct)

    make_tiny_vocab(os.path.join(datadir, "vocab.txt"),
                    ["dog", "big", "is", "the", "running", "park", "a"])


def test_two_process_eval_vqa_submission_and_recall(tmp_path):
    """Multi-host eval paths at REAL process_count=2 (VERDICT r2 #5):
    VQA submission gather (each qid exactly once in the rank-0 merged
    json, reference objectives.py:1537-1565) and host-sharded recall
    score assembly == single-host recall (objectives.py:1315-1317)."""
    import json

    datadir = str(tmp_path / "data")
    os.makedirs(datadir)
    _make_eval_data(datadir)

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_mp_eval_worker.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), datadir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=root)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"eval worker failed:\n{out[-6000:]}"

    results = {}
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MP_EVAL_RESULT")]
        assert lines, f"no MP_EVAL_RESULT in worker output:\n{out[-6000:]}"
        _, pid, payload = lines[0].split(" ", 2)
        results[int(pid)] = json.loads(payload)

    assert set(results) == {0, 1}
    # merged submission: every qid exactly once, written by rank 0 only
    assert results[0]["sub_qids"] == list(range(100, 108))
    assert results[1]["sub_qids"] is None
    assert results[0]["vqa_score_present"]
    # sharded recall identical to the unsharded computation on each host
    for r in results.values():
        assert r["recall_sharded"] == r["recall_local"]
    assert results[0]["recall_sharded"] == results[1]["recall_sharded"]


def test_two_process_preemption_consensus(tmp_path):
    """Multi-host preemption consensus (PARITY #29): rank 1 alone flags
    preemption after its first micro-step; the flag is any-reduced every
    preempt_sync_every=2 micro-batches, so BOTH hosts must exit fit()
    at the same step boundary (micro-step 2) and commit the collective
    mid-epoch 'last' checkpoint together — a host acting on its local
    flag alone would deadlock the other's collectives."""
    import json

    datadir = str(tmp_path / "data")
    os.makedirs(datadir)
    _make_eval_data(datadir)

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_mp_preempt_worker.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), datadir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=root)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"preempt worker failed:\n{out[-6000:]}"

    results = {}
    for out in outs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MP_PREEMPT_RESULT")]
        assert lines, f"no MP_PREEMPT_RESULT in worker output:\n{out[-6000:]}"
        _, pid, payload = lines[0].split(" ", 2)
        results[int(pid)] = json.loads(payload)

    assert set(results) == {0, 1}
    for r in results.values():
        # both hosts stopped at the SAME consensus boundary: micro-step
        # 2 (rank 1 flags at step 1; 1 % 2 != 0 defers the any-reduce),
        # mid-epoch (4 micro-steps/epoch), well short of max_steps=6
        assert r["steps_done"] == 2
        assert r["has_last"]
        assert r["restored_step"] == 2
