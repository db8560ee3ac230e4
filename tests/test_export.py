"""AOT export/serving (vqa_tpu/export.py + cli/export.py + serve --exported).

The frozen StableHLO artifact must reproduce the live Predictor exactly,
load without any model code (flax / vqa_tpu.models never imported — the
deployment story), pad/chunk arbitrary request sizes to the frozen batch,
and slot into the HTTP service unchanged. Beyond-reference capability
(SURVEY.md C23 serving-side complement)."""

import json
import os
import subprocess
import sys
import threading
import urllib.request

import numpy as np
import pytest

from vqa_tpu.cli.export import main as export_main
from vqa_tpu.cli.serve import AnswerService, build_server
from vqa_tpu.cli.train import main as train_main
from vqa_tpu.datasets.fixtures import generate
from vqa_tpu.export import load_export
from vqa_tpu.predictor import Predictor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def exported_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("exportfix"))
    generate(d, n_images=10, n_questions=48, seed=11)
    logs = os.path.join(d, "logs")
    rc = train_main([
        "--path_opt", os.path.join(REPO, "options/vqa2/mutan_att.yaml"),
        "--dir_logs", logs, "--epochs", "1", "--batch_size", "16",
        "--print_freq", "0",
        "--opt", f"vqa.dir={d}/vqa2", "--opt", f"coco.dir={d}/coco",
        "--opt", "vqa.nans=20",
        "--opt", "model.seq2vec.emb_size=12", "--opt", "model.seq2vec.hidden_size=16",
        "--opt", "model.attention.dim_hv=8", "--opt", "model.attention.dim_hq=8",
        "--opt", "model.attention.dim_mm=12", "--opt", "model.attention.R=2",
        "--opt", "model.fusion.dim_hv=8", "--opt", "model.fusion.dim_hq=8",
        "--opt", "model.fusion.dim_mm=12", "--opt", "model.fusion.R=2",
    ])
    assert rc == 0
    out = os.path.join(d, "exported")
    rc = export_main(["--dir_logs", logs, "--out", out, "--batch", "4"])
    assert rc == 0
    predictor = Predictor.from_run(logs, resume="best")
    return d, out, predictor


def test_meta_contents(exported_run):
    d, out, predictor = exported_run
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["format"] == "vqa_tpu.export/1"
    assert meta["batch"] == 4
    assert meta["num_answers"] == predictor.dataset.num_answers
    assert meta["aid_to_ans"] == list(predictor.dataset.vocabs.aid_to_ans)
    assert "cpu" in meta["platforms"] and "tpu" in meta["platforms"]
    assert os.path.getsize(os.path.join(out, "program.jaxexport")) > 0


def test_exported_logits_match_live_predictor(exported_run):
    d, out, predictor = exported_run
    ep = load_export(out)
    names = predictor.dataset.split.image_names[:4]
    questions = [
        "what color is the object",
        "is there a person",
        "how many items are shown",
        "what is on the table",
    ]
    q, lengths = predictor.encode_questions(questions)
    visual = predictor.dataset.features.get(predictor.dataset.features.index_of(names))
    import jax.numpy as jnp

    live = np.asarray(
        predictor._forward(predictor.params, jnp.asarray(visual), q, lengths)
    )
    frozen = ep.logits(visual, q, lengths)
    np.testing.assert_allclose(frozen, live, rtol=1e-5, atol=1e-5)
    # the Predictor-compatible surface agrees too (answers + probabilities)
    a_live = predictor.answer_batch(questions, names, topk=3)
    a_frozen = ep.answer_batch(questions, names, topk=3)
    for row_l, row_f in zip(a_live, a_frozen):
        assert [a for a, _ in row_l] == [a for a, _ in row_f]
        np.testing.assert_allclose(
            [p for _, p in row_l], [p for _, p in row_f], atol=1e-5
        )


def test_padding_and_chunking(exported_run):
    d, out, predictor = exported_run
    ep = load_export(out)
    names = predictor.dataset.split.image_names
    # n=3 pads to the frozen batch of 4; n=7 chunks into 4+3
    qs7 = [f"question number {i}" for i in range(7)]
    ims7 = [names[i % len(names)] for i in range(7)]
    whole = ep.answer_batch(qs7, ims7, topk=2)
    assert len(whole) == 7
    singles = [ep.answer_batch([q], [im], topk=2)[0] for q, im in zip(qs7, ims7)]
    for w, s in zip(whole, singles):
        assert [a for a, _ in w] == [a for a, _ in s]
        np.testing.assert_allclose([p for _, p in w], [p for _, p in s], atol=1e-5)
    with pytest.raises(ValueError, match="exported batch"):
        q, lengths = ep.encode_questions(qs7)
        visual = np.zeros((7, *ep.meta["feature_shape"]), np.float32)
        ep.logits(visual, q, lengths)


def test_serve_exported_mode(exported_run):
    d, out, predictor = exported_run
    ep = load_export(out)
    service = AnswerService(ep, max_batch=ep.batch)
    service.warmup()
    server = build_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        image = predictor.dataset.split.image_names[0]
        body = json.dumps({"question": "what is this", "image": image}).encode()
        req = urllib.request.Request(
            base + "/answer", body, {"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req) as resp:
            payload = json.loads(resp.read())
        expected = predictor.answer_batch(["what is this"], [image], topk=5)[0]
        assert [a for a, _ in payload["answers"]] == [a for a, _ in expected]
    finally:
        server.shutdown()
        server.server_close()


def test_bf16_weights_export(exported_run):
    """--weights_dtype bfloat16 halves the artifact and stays close in
    logits (weights-only cast; inputs/outputs keep their dtypes)."""
    d, out, predictor = exported_run
    out16 = os.path.join(d, "exported_bf16")
    rc = export_main([
        "--dir_logs", os.path.join(d, "logs"), "--out", out16,
        "--batch", "4", "--weights_dtype", "bfloat16",
    ])
    assert rc == 0
    with open(os.path.join(out16, "meta.json")) as f:
        assert json.load(f)["weights_dtype"] == "bfloat16"
    size32 = os.path.getsize(os.path.join(out, "program.jaxexport"))
    size16 = os.path.getsize(os.path.join(out16, "program.jaxexport"))
    assert size16 < 0.75 * size32, (size16, size32)
    ep32, ep16 = load_export(out), load_export(out16)
    names = predictor.dataset.split.image_names[:4]
    questions = ["what is shown"] * 4
    q, lengths = predictor.encode_questions(questions)
    visual = predictor.dataset.features.get(predictor.dataset.features.index_of(names))
    l32, l16 = ep32.logits(visual, q, lengths), ep16.logits(visual, q, lengths)
    np.testing.assert_allclose(l16, l32, atol=0.05)


def test_external_params_export(exported_run):
    """--params external: weight-free program + sidecar npz reproduces the
    baked artifact exactly (f32) and losslessly through the bf16 round-trip
    (npz stores f32; bf16->f32->bf16 is exact)."""
    d, out, predictor = exported_run
    names = predictor.dataset.split.image_names[:4]
    q, lengths = predictor.encode_questions(["is it outdoors"] * 4)
    visual = predictor.dataset.features.get(predictor.dataset.features.index_of(names))
    baked = load_export(out).logits(visual, q, lengths)

    out_ext = os.path.join(d, "exported_ext")
    rc = export_main([
        "--dir_logs", os.path.join(d, "logs"), "--out", out_ext,
        "--batch", "4", "--params", "external",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out_ext, "params.npz"))
    ep = load_export(out_ext)
    np.testing.assert_array_equal(ep.logits(visual, q, lengths), baked)

    out_ext16 = os.path.join(d, "exported_ext_bf16")
    rc = export_main([
        "--dir_logs", os.path.join(d, "logs"), "--out", out_ext16,
        "--batch", "4", "--params", "external", "--weights_dtype", "bfloat16",
    ])
    assert rc == 0
    ep16 = load_export(out_ext16)
    baked16_dir = os.path.join(d, "exported_bf16")
    if not os.path.exists(baked16_dir):  # no ordering dependence on the bf16 test
        export_main(["--dir_logs", os.path.join(d, "logs"), "--out", baked16_dir,
                     "--batch", "4", "--weights_dtype", "bfloat16"])
    baked16 = load_export(baked16_dir)
    np.testing.assert_array_equal(
        ep16.logits(visual, q, lengths), baked16.logits(visual, q, lengths)
    )
    # the external program itself carries no weights: it must be much
    # smaller than the baked one
    assert os.path.getsize(os.path.join(out_ext, "program.jaxexport")) < \
        0.5 * os.path.getsize(os.path.join(out, "program.jaxexport"))


def test_int8_weights_export(exported_run):
    """--weights_dtype int8: the artifact reproduces the live model run with
    eagerly-dequantized params EXACTLY (mechanics, no accuracy threshold),
    stays strongly correlated with the unquantized logits, and is ~4x
    smaller; external mode rejects it."""
    import jax.numpy as jnp

    from vqa_tpu.export import dequantize_int8, quantize_int8

    d, out, predictor = exported_run
    out8 = os.path.join(d, "exported_int8")
    rc = export_main([
        "--dir_logs", os.path.join(d, "logs"), "--out", out8,
        "--batch", "4", "--weights_dtype", "int8",
    ])
    assert rc == 0
    names = predictor.dataset.split.image_names[:4]
    q, lengths = predictor.encode_questions(["what animal is this"] * 4)
    visual = predictor.dataset.features.get(predictor.dataset.features.index_of(names))

    deq = dequantize_int8(quantize_int8(predictor.params))
    ref = np.asarray(predictor._forward(deq, jnp.asarray(visual), q, lengths))
    got = load_export(out8).logits(visual, q, lengths)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    full = np.asarray(
        predictor._forward(predictor.params, jnp.asarray(visual), q, lengths)
    )
    corr = np.corrcoef(got.ravel(), full.ravel())[0, 1]
    assert corr > 0.99, corr

    size32 = os.path.getsize(os.path.join(out, "program.jaxexport"))
    size8 = os.path.getsize(os.path.join(out8, "program.jaxexport"))
    assert size8 < 0.4 * size32, (size8, size32)

    # rejected at argparse level, before any checkpoint load
    with pytest.raises(SystemExit):
        export_main([
            "--dir_logs", os.path.join(d, "logs"), "--out", out8 + "_x",
            "--batch", "4", "--weights_dtype", "int8", "--params", "external",
        ])
    # and at the API level too
    from vqa_tpu.export import save_export

    with pytest.raises(ValueError, match="baked"):
        save_export(out8 + "_y", predictor, batch=4,
                    weights_dtype="int8", params_mode="external")


def test_serve_cli_arg_validation():
    from vqa_tpu.cli.serve import main as serve_main

    with pytest.raises(SystemExit):
        serve_main([])  # neither --dir_logs nor --exported
    with pytest.raises(SystemExit):
        serve_main(["--dir_logs", "x", "--exported", "y"])  # both


def test_dynamic_batcher_over_exported_predictor(exported_run):
    """The serving stack composes: DynamicBatcher(AnswerService(Exported-
    Predictor)) — coalesced AOT serving with no model code."""
    import threading

    from vqa_tpu.cli.serve import AnswerService, DynamicBatcher

    d, out, predictor = exported_run
    ep = load_export(out)
    dyn = DynamicBatcher(AnswerService(ep, max_batch=ep.batch), max_wait_ms=250)
    names = [str(n) for n in predictor.dataset.split.image_names[:4]]
    expected = predictor.answer_batch(["what is here"] * 4, names, topk=2)

    results = [None] * 4
    barrier = threading.Barrier(4)

    def hit(i):
        barrier.wait()
        results[i] = dyn.answer_batch(["what is here"], [names[i]], topk=2)[0]

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for got, expect in zip(results, expected):
        assert [a for a, _ in got] == [a for a, _ in expect]


def test_export_validate_gate(exported_run, capsys):
    """--validate N: the deployment gate reruns real val questions through
    both the live model and the artifact; exact agreement -> rc 0."""
    d, out, predictor = exported_run
    rc = export_main([
        "--dir_logs", os.path.join(d, "logs"),
        "--out", os.path.join(d, "exported_val"),
        "--batch", "4", "--validate", "12",
    ])
    assert rc == 0
    assert "answer agreement 1.0000 over 12" in capsys.readouterr().out


@pytest.mark.parametrize("config,dims", [
    ("cor", ["model.fusion.dim_h=16"]),  # scan/unrolled relation chain
    ("mfb_coatt", ["model.fusion.dim_mm=16", "model.fusion.pool_factor=2"]),
])
def test_structural_family_export_roundtrip(tmp_path, config, dims):
    """The structurally-distinct families (CoR's relation chain, MFB's
    co-attention) freeze and round-trip like the flagship."""
    d = str(tmp_path)
    generate(d, n_images=8, n_questions=32, seed=17)
    logs = os.path.join(d, "logs")
    rc = train_main([
        "--path_opt", os.path.join(REPO, f"options/vqa2/{config}.yaml"),
        "--dir_logs", logs, "--epochs", "1", "--batch_size", "16",
        "--print_freq", "0",
        "--opt", f"vqa.dir={d}/vqa2", "--opt", f"coco.dir={d}/coco",
        "--opt", "vqa.nans=20",
        "--opt", "model.seq2vec.emb_size=12", "--opt", "model.seq2vec.hidden_size=16",
    ] + sum([["--opt", kv] for kv in dims], []))
    assert rc == 0
    out = os.path.join(d, "exported")
    rc = export_main([
        "--dir_logs", logs, "--out", out, "--batch", "4", "--validate", "8",
    ])
    assert rc == 0


def test_noatt_export_roundtrip(tmp_path):
    """Shape generality: a noatt model (pooled [B, 2048] features, no region
    axis) exports and round-trips like the att families."""
    d = str(tmp_path)
    generate(d, n_images=8, n_questions=32, seed=13)
    logs = os.path.join(d, "logs")
    rc = train_main([
        "--path_opt", os.path.join(REPO, "options/vqa2/mutan_noatt.yaml"),
        "--dir_logs", logs, "--epochs", "1", "--batch_size", "16",
        "--print_freq", "0",
        "--opt", f"vqa.dir={d}/vqa2", "--opt", f"coco.dir={d}/coco",
        "--opt", "vqa.nans=20",
        "--opt", "model.seq2vec.emb_size=12", "--opt", "model.seq2vec.hidden_size=16",
        "--opt", "model.fusion.dim_hv=8", "--opt", "model.fusion.dim_hq=8",
        "--opt", "model.fusion.dim_mm=12", "--opt", "model.fusion.R=2",
    ])
    assert rc == 0
    out = os.path.join(d, "exported")
    assert export_main(["--dir_logs", logs, "--out", out, "--batch", "4"]) == 0
    predictor = Predictor.from_run(logs, resume="best")
    ep = load_export(out)
    assert ep.meta["feature_shape"] == [2048]
    names = [str(n) for n in predictor.dataset.split.image_names[:3]]
    live = predictor.answer_batch(["what is that"] * 3, names, topk=2)
    frozen = ep.answer_batch(["what is that"] * 3, names, topk=2)
    for a, b in zip(live, frozen):
        assert [x for x, _ in a] == [x for x, _ in b]


def test_load_path_never_imports_model_code(exported_run):
    """The deployment contract: serving a frozen artifact touches neither
    flax nor the model zoo (subprocess so sys.modules starts clean)."""
    d, out, predictor = exported_run
    # plain str: a numpy.str_ would interpolate as "np.str_(...)" below
    image = str(predictor.dataset.split.image_names[0])
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize registers the TPU plugin
import sys, json
from vqa_tpu.export import load_export
p = load_export({out!r})
ans = p.answer_batch(["what color is it"], [{image!r}], topk=2)
assert "flax" not in sys.modules, "flax imported on the AOT load path"
bad = [m for m in sys.modules if m.startswith("vqa_tpu.models")]
assert not bad, f"model zoo imported on the AOT load path: {{bad}}"
print(json.dumps(ans[0][0][0]))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr
    top1 = json.loads(proc.stdout.strip().splitlines()[-1])
    assert top1 == predictor.answer_batch(["what color is it"], [image], topk=2)[0][0][0]
