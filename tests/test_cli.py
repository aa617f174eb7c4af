"""CLI integration smoke tests: every entry point runs end-to-end on tiny data."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "corpus.txt"
    lines = ["the cat sat on the mat and the dog sat on the log",
             "a cat and a dog and a rat sat together",
             "the rat ran to the mat and the cat ran after it"] * 5
    p.write_text("\n".join(lines))
    return str(p)


@pytest.fixture(scope="module")
def trained_dir(corpus_file, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tok") / "t")
    from hyptokenizer_tpu.cli import train_tokenizer
    train_tokenizer.main([
        "--corpus-path", corpus_file, "--output-dir", out,
        "--embedding-dim", "8", "--steps", "40", "--log-every", "40",
        "--merge-threshold", "2.0", "--max-vocab-size", "128"])
    return out


def test_preprocess_wiki(corpus_file, tmp_path):
    from hyptokenizer_tpu.cli import preprocess_wiki
    out = str(tmp_path / "proc")
    preprocess_wiki.main(["--input-path", corpus_file, "--output-dir", out,
                          "--min-line-length", "5"])
    assert os.path.exists(os.path.join(out, "wiki_processed.txt"))
    assert os.path.exists(os.path.join(out, "vocab_initial.txt"))


def test_train_tokenizer(trained_dir):
    assert os.path.exists(os.path.join(trained_dir, "merges.json"))


def test_train_enhanced(corpus_file, tmp_path):
    from hyptokenizer_tpu.cli import train_enhanced_tokenizer
    out = str(tmp_path / "enh")
    train_enhanced_tokenizer.main([
        "--corpus-path", corpus_file, "--output-dir", out,
        "--embedding-dim", "8", "--steps", "30", "--log-every", "15",
        "--merge-threshold", "2.0", "--max-vocab-size", "128",
        "--no-use-hierarchical", "--no-use-adaptive-curvature",
        "--corpus-max-tokens", "2048", "--embed-steps", "50"])
    assert os.path.exists(os.path.join(out, "enhanced_config.json"))


def test_benchmark_efficiency(trained_dir, corpus_file, tmp_path, capsys):
    from hyptokenizer_tpu.cli import benchmark_efficiency
    out = str(tmp_path / "eff.json")
    benchmark_efficiency.main([
        "--tokenizer-dir", trained_dir, "--text-path", corpus_file,
        "--max-lines", "10", "--output-path", out])
    with open(out) as f:
        res = json.load(f)
    assert res["tokenize"]["tokens_per_sec"] > 0


def test_compare_tokenizers(trained_dir, corpus_file, tmp_path):
    from hyptokenizer_tpu.cli import compare_tokenizers
    out = str(tmp_path / "cmp")
    compare_tokenizers.main([
        "--tokenizer", f"hyp={trained_dir}", "--text-path", corpus_file,
        "--output-dir", out, "--max-lines", "10", "--no-plot"])
    with open(os.path.join(out, "comparison.json")) as f:
        res = json.load(f)
    assert "hyp" in res


def test_eval_hierarchy_cli(trained_dir, tmp_path):
    import networkx as nx
    import pickle
    g = nx.Graph()
    # Use single chars that exist in the trained vocab.
    g.add_edge("a.n.01", "t.n.01")
    g.add_edge("t.n.01", "c.n.01")
    g.add_edge("c.n.01", "d.n.01")
    gp = str(tmp_path / "g.pkl")
    with open(gp, "wb") as f:
        pickle.dump(g, f)
    from hyptokenizer_tpu.cli import eval_hierarchy
    out = str(tmp_path / "hier")
    eval_hierarchy.main(["--tokenizer-dir", trained_dir, "--graph-path", gp,
                         "--output-dir", out, "--num-pairs", "20"])
    with open(os.path.join(out, "distortion_stats.json")) as f:
        stats = json.load(f)
    assert stats["num_pairs"] == 20


def test_analysis_cli(trained_dir, tmp_path):
    from hyptokenizer_tpu.cli import analysis
    out = str(tmp_path / "plots")
    analysis.main(["--tokenizer-dir", trained_dir, "--output-dir", out])
    assert os.path.exists(os.path.join(out, "embedding_pca.png"))


def test_test_tpu_cli(capsys):
    from hyptokenizer_tpu.cli import test_tpu
    test_tpu.main([])
    out = capsys.readouterr().out
    assert "backend" in out and "OK" in out


def test_train_retrieval_synthetic(tmp_path):
    from hyptokenizer_tpu.cli import train_retrieval
    out = str(tmp_path / "ret")
    train_retrieval.main([
        "--synthetic", "--output-dir", out, "--epochs", "1",
        "--batch-size", "8", "--batches-per-epoch", "2", "--image-size", "16",
        "--seq-len", "8", "--tower-dim", "16", "--projection-dim", "8"])
    assert os.path.exists(os.path.join(out, "retrieval_history.json"))


def test_baselines_cli(corpus_file, tmp_path):
    pytest.importorskip("tokenizers")
    from hyptokenizer_tpu.cli import train_baseline_tokenizers
    out = str(tmp_path / "base")
    train_baseline_tokenizers.main([
        "--input-file", corpus_file, "--output-dir", out,
        "--vocab-size", "100", "--kinds", "bpe"])
    assert os.path.exists(os.path.join(out, "baseline_stats.json"))


def test_train_nlp_tasks_mlm(trained_dir, corpus_file, tmp_path):
    from hyptokenizer_tpu.cli import train_nlp_tasks
    out = str(tmp_path / "nlp")
    train_nlp_tasks.main([
        "--method", "hyperbolic", "--model-path", trained_dir,
        "--task", "mlm", "--train-text", corpus_file,
        "--val-text", corpus_file, "--output-dir", out,
        "--hidden-size", "32", "--num-layers", "1", "--num-heads", "2",
        "--max-length", "24", "--epochs", "1", "--batch-size", "8",
        "--max-lines", "12"])
    results = json.load(open(os.path.join(out, "nlp_results.json")))
    assert results["mlm_val_perplexity"] > 0


def test_train_nlp_tasks_classification(trained_dir, tmp_path):
    from hyptokenizer_tpu.cli import train_nlp_tasks
    cls = tmp_path / "cls.tsv"
    rows = [("0", "the cat sat on the mat"), ("1", "a dog ran to the log"),
            ("0", "the cat and the rat"), ("1", "the dog sat together")] * 4
    cls.write_text("\n".join(f"{a}\t{b}" for a, b in rows))
    out = str(tmp_path / "nlp_cls")
    train_nlp_tasks.main([
        "--method", "hyperbolic", "--model-path", trained_dir,
        "--task", "classification", "--train-cls", str(cls),
        "--output-dir", out, "--hidden-size", "32", "--num-layers", "1",
        "--num-heads", "2", "--max-length", "16", "--epochs", "1",
        "--batch-size", "8", "--max-lines", "16"])
    results = json.load(open(os.path.join(out, "nlp_results.json")))
    assert 0.0 <= results["classification_accuracy"] <= 1.0


def test_bench_scaling_cli(capsys):
    from hyptokenizer_tpu.cli import bench_scaling
    bench_scaling.main(["--max-vocab-size", "256", "--n-init", "64",
                        "--embedding-dim", "8", "--steps", "32",
                        "--warmup", "8"])
    out = capsys.readouterr().out
    data = json.loads(out.strip().splitlines()[-1])
    assert "steps_per_sec_by_devices" in data
    assert all(v > 0 for v in data["steps_per_sec_by_devices"].values())


def test_aux_flags_config_metrics_profile_nans(corpus_file, tmp_path):
    """--config / --metrics-path / --profile / --debug-nans are wired
    (VERDICT r1 #5): config JSON sets defaults, explicit flags win, metrics
    stream as JSONL, a profiler trace directory is produced, and the
    effective config persists next to the artifacts."""
    from hyptokenizer_tpu.cli import train_enhanced_tokenizer
    from hyptokenizer_tpu.utils.config import TrainConfig

    cfg_path = str(tmp_path / "cfg.json")
    TrainConfig(embedding_dim=8, steps=20, log_every=10,
                merge_threshold=2.0, max_vocab_size=128,
                use_hierarchical=False, use_adaptive_curvature=False,
                use_compression_aware=False,
                corpus_max_tokens=2048).to_json(cfg_path)
    out = str(tmp_path / "enh")
    metrics = str(tmp_path / "metrics.jsonl")
    profile_dir = str(tmp_path / "trace")
    train_enhanced_tokenizer.main([
        "--corpus-path", corpus_file, "--output-dir", out,
        "--config", cfg_path,
        "--steps", "16",              # explicit flag overrides config's 20
        "--metrics-path", metrics,
        "--profile", profile_dir,
        "--debug-nans"])
    import jax
    assert jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", False)
    # Metrics JSONL: one record per chunk + the summary record.
    with open(metrics) as f:
        records = [json.loads(ln) for ln in f]
    chunk_recs = [r for r in records if "step" in r]
    assert len(chunk_recs) == 2  # 16 steps / log_every 10 -> 2 chunks
    assert all("time" in r for r in records)
    assert any("merges_per_sec" in r for r in records)  # summary streamed
    # Profiler trace directory was written.
    assert os.path.isdir(profile_dir) and os.listdir(profile_dir)
    # Effective config persisted; config defaults vs flag override visible.
    with open(os.path.join(out, "train_config.json")) as f:
        eff = json.load(f)
    assert eff["steps"] == 16                  # flag won
    assert eff["embedding_dim"] == 8           # config default applied
    assert eff["use_hierarchical"] is False
    # Round-trips back into a TrainConfig.
    cfg2 = TrainConfig.from_json(os.path.join(out, "train_config.json"))
    assert cfg2.tokenizer_kwargs()["max_vocab_size"] == 128


def test_aux_flags_base_cli(corpus_file, tmp_path):
    from hyptokenizer_tpu.cli import train_tokenizer
    out = str(tmp_path / "base")
    metrics = str(tmp_path / "m.jsonl")
    train_tokenizer.main([
        "--corpus-path", corpus_file, "--output-dir", out,
        "--embedding-dim", "8", "--steps", "20", "--log-every", "10",
        "--merge-threshold", "2.0", "--max-vocab-size", "128",
        "--metrics-path", metrics])
    with open(metrics) as f:
        records = [json.loads(ln) for ln in f]
    assert len(records) == 2 and all("vocab_size" in r for r in records)
    assert os.path.exists(os.path.join(out, "train_config.json"))


def test_analysis_grid_plots(tmp_path):
    """distortion-vs-vocab + perplexity-vs-distortion plots from the
    experiment-grid layout (VERDICT r1 #8; reference notebooks/analysis.py
    :43-205)."""
    grid = tmp_path / "results"
    for method, dist, ppl in [("hyperbolic", 1.2, 40.0), ("bpe", 2.0, 35.0)]:
        for v in (1000, 2000):
            d = grid / method / f"v{v}"
            d.mkdir(parents=True)
            (d / "distortion_stats.json").write_text(
                json.dumps({"mean": dist + v / 10000, "std": 0.1}))
            (d / "nlp_results.json").write_text(
                json.dumps({"mlm_perplexity": ppl - v / 1000}))
    out = tmp_path / "figs"
    from hyptokenizer_tpu.cli import analysis
    analysis.main(["--results-dir", str(grid), "--output-dir", str(out),
                   "--methods", "hyperbolic,bpe,missing",
                   "--vocab-sizes", "1000,2000,4000"])
    assert os.path.exists(out / "distortion_vs_vocab.png")
    assert os.path.exists(out / "perplexity_vs_distortion.png")
    n = analysis.plot_distortion_vs_vocab(
        str(grid), ["hyperbolic", "bpe"], [1000, 2000],
        str(out / "d2.png"))
    assert n == 4
    n = analysis.plot_perplexity_vs_distortion(
        str(grid), ["hyperbolic"], [1000, 2000, 4000], str(out / "p2.png"))
    assert n == 2
    # Downstream + efficiency bars from the same grid layout.
    (grid / "hyperbolic" / "v1000" / "efficiency.json").write_text(
        json.dumps({"tokenize": {"tokens_per_sec": 5e5},
                    "training_summary": {"train_seconds": 120.0}}))
    n = analysis.plot_downstream_bars(
        str(grid), ["hyperbolic", "bpe"], [1000, 2000], str(out / "d3.png"))
    assert n == 4 and os.path.exists(out / "d3.png")
    n = analysis.plot_efficiency_bars(
        str(grid), ["hyperbolic"], [1000], str(out / "e1.png"))
    assert n == 1 and os.path.exists(out / "e1.png")
