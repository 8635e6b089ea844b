"""Inference porcelain + eval harness tests (tiny model)."""

import json
import os

import numpy as np
import pytest

import jax

from eraxvif5tts_tpu.audio.io import read_wav, write_wav
from eraxvif5tts_tpu.configs import ArchConfig, ModelConfig
from eraxvif5tts_tpu.eval.eval_infer_batch import run_eval_inference, split_between_processes
from eraxvif5tts_tpu.eval.utils_eval import (
    PromptBatch,
    edit_distance,
    get_inference_prompt,
    get_seedtts_testset_metainfo,
    word_error_rate,
)
from eraxvif5tts_tpu.infer.infer_cli import (
    merge_config,
    parse_args,
    resolve_example_path,
    run,
    split_voice_chunks,
)
from eraxvif5tts_tpu.infer.speech_edit import edit_speech
from eraxvif5tts_tpu.infer.utils_infer import infer_batch_process, infer_process
from eraxvif5tts_tpu.infer.wrapper import F5TTSWrapper

SR = 24000


@pytest.fixture(scope="module")
def wrapper():
    cfg = ModelConfig(arch=ArchConfig(dim=32, depth=1, heads=2, dim_head=16,
                                      text_dim=16, conv_layers=0, dropout=0.0))
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!?")}
    return F5TTSWrapper(model_cfg=cfg, vocab_char_map=vocab, nfe_step=2,
                        duration_buckets=(64, 128), text_buckets=(64,))


@pytest.fixture(scope="module")
def ref_wav_path(tmp_path_factory):
    t = np.arange(SR // 4) / SR
    wav = (0.2 * np.sin(2 * np.pi * 160 * t)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("refs") / "ref.wav")
    write_wav(path, wav, SR)
    return path


def test_infer_process_end_to_end(wrapper, ref_wav_path):
    wave, sr, spec = infer_process(ref_wav_path, "hello ref. ", "a test.",
                                   wrapper, nfe_step=2, seed=0)
    assert sr == SR and len(wave) > 0 and np.isfinite(wave).all()
    assert spec.shape[0] == 100


def test_infer_batch_process_streaming(wrapper, ref_wav_path):
    wav, sr = read_wav(ref_wav_path)
    chunks = list(infer_batch_process(
        (wav, sr), "hello ref. ", ["first piece.", "second piece."],
        wrapper, streaming=True, chunk_size=1024, nfe_step=2, seed=0,
    ))
    assert len(chunks) >= 2
    assert all(piece.shape[0] <= 1024 for piece, _ in chunks)
    assert all(s == SR for _, s in chunks)


def test_speech_edit(wrapper, ref_wav_path):
    wav, _ = read_wav(ref_wav_path)
    out = edit_speech(
        wrapper, wav[0], "hello ref", "hello dog",
        edit_spans_seconds=[(0.05, 0.12)], nfe_step=2, seed=0, use_pinyin=False,
    )
    assert len(out) > 0 and np.isfinite(out).all()
    # unedited tail should be (vocoder-reconstructed) audio, not zeros
    assert np.abs(out).max() > 1e-4


# ---------------------------------------------------------------------------
# infer_cli


def test_split_voice_chunks():
    text = "Hello there. [alt]Different voice! [main]Back again."
    chunks = split_voice_chunks(text)
    assert chunks == [("main", "Hello there."), ("alt", "Different voice!"),
                      ("main", "Back again.")]


def test_infer_cli_run(wrapper, ref_wav_path, tmp_path, monkeypatch):
    # patch ASR-needing preprocess: supply ref_text so transcription is skipped
    args = parse_args([
        "-r", ref_wav_path, "-s", "hello ref.", "-t", "a cli test.",
        "-o", str(tmp_path), "-w", "out.wav", "--nfe_step", "2", "--seed", "0",
    ])
    config = merge_config(args)
    path = run(config, wrapper=wrapper)
    assert os.path.isfile(path)
    wav, sr = read_wav(path)
    assert sr == SR and wav.shape[1] > 0


def test_bundled_example_tomls(ref_wav_path, tmp_path, wrapper):
    """The shipped infer/examples configs (reference `infer/examples/*`) parse
    through merge_config, reference files that exist, and the multi-voice story
    only uses voices the story.toml configures."""
    root = os.path.join(os.path.dirname(__file__), "..")
    basic = os.path.join(root, "eraxvif5tts_tpu/infer/examples/basic/basic.toml")
    story = os.path.join(root, "eraxvif5tts_tpu/infer/examples/multi/story.toml")

    cfg = merge_config(parse_args(["-c", basic]))
    assert os.path.isfile(os.path.join(root, cfg["ref_audio"]))
    assert cfg["ref_text"] and cfg["gen_text"]
    wav, sr = read_wav(os.path.join(root, cfg["ref_audio"]))
    assert sr == SR and wav.shape[1] > SR  # >1 s of 24 kHz audio

    cfg = merge_config(parse_args(["-c", story]))
    assert set(cfg["voices"]) == {"town", "country"}
    for voice in cfg["voices"].values():
        assert os.path.isfile(os.path.join(root, voice["ref_audio"]))
    text = open(os.path.join(root, cfg["gen_file"])).read()
    used = {name for name, _ in split_voice_chunks(text)}
    assert used == {"main", "town", "country"}

    # example-relative paths resolve from ANY cwd via resolve_example_path
    monkey_cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        resolved = resolve_example_path(cfg["voices"]["town"]["ref_audio"])
        assert os.path.isabs(resolved) and os.path.isfile(resolved)
        resolved_story = resolve_example_path(cfg["gen_file"])
        assert os.path.isfile(resolved_story)
        assert resolve_example_path("no/such/file.wav") == "no/such/file.wav"
    finally:
        os.chdir(monkey_cwd)

    # the basic example drives the CLI end to end (tiny wrapper, its own ref)
    cfg = merge_config(parse_args([
        "-c", basic, "-r", ref_wav_path, "-s", "hello ref.",
        "-t", "an example config test.", "-o", str(tmp_path),
        "--nfe_step", "2", "--seed", "0",
    ]))
    assert os.path.isfile(run(cfg, wrapper=wrapper))


def test_merge_config_toml(tmp_path):
    toml = tmp_path / "cfg.toml"
    toml.write_text('model = "F5TTS_v1_Base"\nnfe_step = 16\nref_audio = "x.wav"\n')
    args = parse_args(["-c", str(toml), "--nfe_step", "8"])
    config = merge_config(args)
    assert config["nfe_step"] == 8  # CLI overrides TOML
    assert config["ref_audio"] == "x.wav"


# ---------------------------------------------------------------------------
# eval harness


def test_wer_native():
    assert edit_distance(list("abc"), list("abc")) == 0
    assert edit_distance(list("abc"), list("axc")) == 1
    assert word_error_rate("the cat sat", "the cat sat") == 0.0
    assert word_error_rate("the cat sat", "the dog sat") == pytest.approx(1 / 3)
    assert word_error_rate("你好吗", "你好了", language="zh") == pytest.approx(1 / 3)


def test_metainfo_and_split(tmp_path):
    meta = tmp_path / "test.lst"
    meta.write_text("utt1|prompt one|p1.wav|target one\n"
                    "utt2|prompt two|p2.wav|target two|gt2.wav\n")
    rows = get_seedtts_testset_metainfo(str(meta))
    assert len(rows) == 2 and rows[0][0] == "utt1" and rows[1][4] == "gt2.wav"
    assert split_between_processes(list(range(10)), 0, 4) == [0, 4, 8]
    assert split_between_processes(list(range(10)), 3, 4) == [3, 7]


def test_get_inference_prompt_and_eval_run(wrapper, ref_wav_path, tmp_path):
    meta = [("utt_a", "hello ref", ref_wav_path, "some target text", ""),
            ("utt_b", "hello ref", ref_wav_path, "other text", "")]

    def mel_fn(wav):
        import jax.numpy as jnp

        n = len(wav) // 256 * 256
        mel = wrapper._mel_jit(jnp.asarray(wav[None, :n]))
        return np.asarray(mel.swapaxes(1, 2)[0, : n // 256])

    batches = get_inference_prompt(
        meta, mel_fn=mel_fn, load_wav=read_wav, tokenize=lambda t: list(t),
        min_seconds=0.2, max_seconds=2.0, num_buckets=8, batch_frames=600,
    )
    assert sum(len(b.utts) for b in batches) == 2
    report = run_eval_inference(wrapper, batches, str(tmp_path / "gen"), nfe_step=2)
    assert report["utterances"] == 2
    assert os.path.isfile(tmp_path / "gen" / "utt_a.wav")
    assert report["rtf"] > 0


def test_ecapa_tdnn_embedding_and_sim(tmp_path, ref_wav_path):
    import jax.numpy as jnp

    from eraxvif5tts_tpu.eval.ecapa_tdnn import (
        ecapa_embed,
        init_random_params,
        make_mel_embed_fn,
    )
    from eraxvif5tts_tpu.eval.utils_eval import run_sim

    params = init_random_params(np.random.default_rng(0), feat_dim=80,
                                channels=64, emb_dim=32)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 80)).astype(np.float32))
    emb = jax.jit(ecapa_embed)(params, feats)
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb)).all()

    embed_fn = make_mel_embed_fn()
    results = run_sim([(ref_wav_path, ref_wav_path)], embed_fn)
    assert results[0]["sim"] == pytest.approx(1.0, abs=1e-4)  # self-similarity


def test_parse_speechtypes_text():
    from eraxvif5tts_tpu.infer.infer_gradio import parse_speechtypes_text

    segs = parse_speechtypes_text(
        "{Regular} Hello. {Surprised} What?! {Whisper} bye..."
    )
    assert segs == [
        {"style": "Regular", "text": "Hello."},
        {"style": "Surprised", "text": "What?!"},
        {"style": "Whisper", "text": "bye..."},
    ]
    # untagged leading text defaults to Regular
    assert parse_speechtypes_text("plain text")[0] == {"style": "Regular",
                                                       "text": "plain text"}


def test_generate_multistyle_routes_per_type(wrapper, ref_wav_path, tmp_path):
    from eraxvif5tts_tpu.infer.infer_gradio import generate_multistyle

    t = np.arange(SR // 4) / SR
    other = str(tmp_path / "other.wav")
    write_wav(other, (0.2 * np.sin(2 * np.pi * 420 * t)).astype(np.float32), SR)
    refs = {"Regular": (ref_wav_path, "hello ref. "),
            "Whisper": (other, "soft voice. ")}
    wave, sr = generate_multistyle(
        wrapper, refs, "{Regular} one. {Whisper} two. {Unknown} three.",
        nfe_step=2, seed=0,
    )
    assert sr == SR and len(wave) > 0 and np.isfinite(wave).all()


def test_parallel_scoring_order_and_prompt_cache(tmp_path):
    """Threaded WER/SIM scoring preserves input order; prompt embeddings are
    computed once per distinct prompt (reference parallelizes with mp.Pool,
    `eval_seedtts_testset.py:62-70`)."""
    import threading

    from eraxvif5tts_tpu.eval.utils_eval import run_asr_wer, run_sim

    pairs = [(f"w{i}.wav", f"truth {i}") for i in range(16)]
    results = run_asr_wer(pairs, asr_fn=lambda p: f"truth {p[1:-4]}", num_workers=4)
    assert [r["wav"] for r in results] == [p[0] for p in pairs]
    assert all(r["wer"] == 0.0 for r in results)

    calls: list[str] = []
    lock = threading.Lock()

    def embed_fn(path):
        with lock:
            calls.append(path)
        return np.ones(4) * (hash(path) % 7 + 1)

    sim_pairs = [(f"gen{i}.wav", "prompt.wav") for i in range(8)]
    results = run_sim(sim_pairs, embed_fn, num_workers=4)
    assert [r["gen"] for r in results] == [p[0] for p in sim_pairs]
    # 8 gen embeddings + exactly one prompt embedding
    assert calls.count("prompt.wav") == 1
    assert len(calls) == 9


def test_zh_wer_normalization_and_fake_asr(tmp_path):
    """zh WER is char-level after ASCII+CJK punctuation strip (reference
    `utils_eval.py:322-338`); the whole run_asr_wer path works with an injected
    asr_fn (paraformer gated offline)."""
    from eraxvif5tts_tpu.eval.utils_eval import (
        load_asr_fn, normalize_text, word_error_rate, run_asr_wer)

    # CJK + ASCII punctuation vanish; characters split individually
    assert normalize_text("你好，世界。Hello!", "zh") == list("你好世界hello")
    assert normalize_text("「引用」：测试…！", "zh") == list("引用测试")
    # char-level WER: one substitution over four chars
    assert word_error_rate("你好世界", "你好世间", language="zh") == 0.25
    assert word_error_rate("你好。", "你好", language="zh") == 0.0

    results = run_asr_wer([("a.wav", "你好，世界"), ("b.wav", "今天天气")],
                          language="zh",
                          asr_fn=lambda p: {"a.wav": "你好世界。",
                                            "b.wav": "今天天气很好"}[p])
    assert results[0]["wer"] == 0.0
    assert results[1]["wer"] == 0.5  # two insertions over four ref chars

    # the paraformer backend is gated with a loud, actionable error
    import pytest as _pytest
    with _pytest.raises((ImportError, NotImplementedError)):
        load_asr_fn("zh")
    # every other language routes through multilingual Whisper (closure —
    # the weights themselves are gated at call time, not at load)
    assert callable(load_asr_fn("fr"))
    assert callable(load_asr_fn("vi"))


def test_eval_utmos_dir_with_injected_scorer(tmp_path):
    """eval_utmos_dir's threading + jsonl + summary math, exercised offline with
    a fake utmos_fn (the torch.hub backend needs egress)."""
    import json
    import wave as wave_mod

    from eraxvif5tts_tpu.eval.scorers import eval_utmos_dir

    gen_dir = tmp_path / "gen"
    gen_dir.mkdir()
    for i in range(5):
        with wave_mod.open(str(gen_dir / f"utt{i}.wav"), "wb") as f:
            f.setnchannels(1); f.setsampwidth(2); f.setframerate(24000)
            f.writeframes(b"\x00\x00" * 240)

    scores = {f"utt{i}.wav": 3.0 + 0.1 * i for i in range(5)}
    out = tmp_path / "utmos.jsonl"
    summary = eval_utmos_dir(str(gen_dir), out_jsonl=str(out),
                             utmos_fn=lambda p: scores[os.path.basename(p)])
    assert summary["n"] == 5
    assert abs(summary["utmos_mean"] - 3.2) < 1e-9

    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 6  # 5 rows + summary
    # rows are sorted by filename and carry per-wav scores
    assert [l["wav"] for l in lines[:5]] == [f"utt{i}.wav" for i in range(5)]
    assert lines[2]["utmos"] == 3.2
    assert lines[5] == summary


def test_chat_session_turns_and_reset():
    """Voice-chat conversation core (reference `infer_gradio.py:623-691`):
    message bookkeeping, empty-input no-op, clear, system-prompt reset."""
    from eraxvif5tts_tpu.infer.infer_gradio import ChatSession

    seen = []

    def fake_chat(messages):
        seen.append([m.copy() for m in messages])
        return f"reply #{sum(m['role'] == 'user' for m in messages)}"

    s = ChatSession(system_prompt="stay brief.")
    assert s.messages == [{"role": "system", "content": "stay brief."}]
    assert s.process_input("  ", fake_chat) is None and s.history == []

    assert s.process_input("hello", fake_chat) == "reply #1"
    assert s.process_input("again", fake_chat) == "reply #2"
    assert s.history == [("hello", "reply #1"), ("again", "reply #2")]
    # chat_fn sees the full running conversation, system prompt first
    assert seen[1][0]["role"] == "system"
    assert [m["role"] for m in seen[1]] == ["system", "user", "assistant", "user"]

    s.clear()
    assert s.history == [] and len(s.messages) == 1

    s.process_input("hi", fake_chat)
    s.set_system_prompt("new persona")
    assert s.messages == [{"role": "system", "content": "new persona"}]
    assert s.history == []


def test_chat_response_synthesis(wrapper, ref_wav_path):
    """The last assistant reply is spoken in the reference voice
    (reference `generate_audio_response`, `infer_gradio.py:656-676`)."""
    from eraxvif5tts_tpu.infer.infer_gradio import (
        ChatSession,
        synthesize_chat_response,
    )

    s = ChatSession()
    # guards: no history / no ref audio / unanswered turn -> None
    assert synthesize_chat_response(wrapper, s, ref_wav_path, "hello ref. ") is None
    s.process_input("say hi", lambda m: "hi there.")
    assert synthesize_chat_response(wrapper, s, None, "hello ref. ") is None

    out = synthesize_chat_response(wrapper, s, ref_wav_path, "hello ref. ",
                                   remove_silence=False)
    assert out is not None
    sr, wave = out
    assert sr == SR and len(wave) > 0 and np.isfinite(wave).all()


def test_eval_cli_seedtts_librispeech_utmos(tmp_path, ref_wav_path):
    """`python -m eraxvif5tts_tpu.eval` drivers (reference eval_seedtts_testset /
    eval_librispeech_test_clean / eval_utmos entry points) with injected
    scorers: jsonl written into the gen dir, summary aggregates returned."""
    from eraxvif5tts_tpu.eval.__main__ import main as eval_main

    gen = tmp_path / "gen"
    gen.mkdir()
    t = np.arange(SR // 8) / SR
    for utt in ("utt1", "utt2"):
        write_wav(str(gen / f"{utt}.wav"),
                  (0.1 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), SR)

    meta = tmp_path / "meta.lst"
    meta.write_text(f"utt1|prompt one|{ref_wav_path}|target one\n"
                    f"utt2|prompt two|{ref_wav_path}|target two|gt2.wav\n")

    fake_asr = lambda path: "target one" if "utt1" in path else "wrong text"
    s = eval_main(["seedtts", "-m", str(meta), "-g", str(gen), "-e", "wer",
                   "-n", "2"], asr_fn=fake_asr)
    assert s["n"] == 2 and s["wer_mean"] == pytest.approx(0.5)
    lines = (gen / "_wer_results.jsonl").read_text().strip().splitlines()
    assert len(lines) == 3 and json.loads(lines[0])["wer"] == 0.0

    fake_embed = lambda path: np.ones(4) if "utt" in os.path.basename(path) else np.array([1.0, 0, 0, 0])
    s = eval_main(["seedtts", "-m", str(meta), "-g", str(gen), "-e", "sim"],
                  embed_fn=fake_embed)
    assert s["n"] == 2 and s["sim_mean"] == pytest.approx(0.5)
    assert (gen / "_sim_results.jsonl").is_file()

    # librispeech cross-sentence metalst: tab-separated, .flac paths derived
    # from speaker-chapter utterance ids; gen wavs live in gen_wav_dir
    ls_meta = tmp_path / "ls.lst"
    ls_meta.write_text(
        "1089-134686-0001\t3.0\tref text a\t1089-134686-0005\t4.0\tgen text a\n"
        "1188-133604-0002\t2.5\tref text b\t1188-133604-0007\t5.0\tgen text b\n")
    for utt in ("1089-134686-0005", "1188-133604-0007"):
        write_wav(str(gen / f"{utt}.wav"),
                  (0.1 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), SR)
    fake_asr2 = lambda path: "gen text a" if "0005" in path else "gen text b"
    s = eval_main(["librispeech", "-m", str(ls_meta), "-p", str(tmp_path),
                   "-g", str(gen), "-e", "wer"], asr_fn=fake_asr2)
    assert s["n"] == 2 and s["wer_mean"] == 0.0

    s = eval_main(["utmos", "-g", str(gen)], utmos_fn=lambda p: 3.5)
    assert s["n"] == 4 and s["utmos_mean"] == pytest.approx(3.5)
    assert (gen / "_utmos_results.jsonl").is_file()


def test_speech_edit_span_validation(wrapper, ref_wav_path):
    """Spans are clamped to the clip and to the previous span's end; an empty
    span after clamping raises a clear ValueError instead of a numpy shape
    error deep in the mask assembly."""
    wav, _ = read_wav(ref_wav_path)
    kw = dict(nfe_step=2, seed=0, use_pinyin=False)

    # end past the clip -> clamped, synthesizes
    out = edit_speech(wrapper, wav[0], "hello ref", "hello dog",
                      edit_spans_seconds=[(0.2, 5.0)], **kw)
    assert len(out) > 0 and np.isfinite(out).all()
    # negative start -> clamped to 0
    out = edit_speech(wrapper, wav[0], "hello ref", "hello dog",
                      edit_spans_seconds=[(-0.1, 0.12)], **kw)
    assert len(out) > 0 and np.isfinite(out).all()
    # overlap -> second span trimmed to start at the first span's end
    out = edit_speech(wrapper, wav[0], "hello ref", "hello dog",
                      edit_spans_seconds=[(0.01, 0.1), (0.05, 0.2)], **kw)
    assert len(out) > 0 and np.isfinite(out).all()
    # inverted span -> loud error
    with pytest.raises(ValueError, match="edit span"):
        edit_speech(wrapper, wav[0], "hello ref", "hello dog",
                    edit_spans_seconds=[(0.2, 0.1)], **kw)


def test_infer_cli_reference_flags_merge():
    """-mc/--vocoder_name/--target_rms/--device reach the merged config
    (reference infer_cli.py flag surface)."""
    args = parse_args([
        "-mc", "custom.yaml", "--vocoder_name", "bigvgan",
        "--target_rms", "0.12", "--device", "tpu",
        "-r", "x.wav", "-t", "hi.",
    ])
    config = merge_config(args)
    assert config["model_cfg"] == "custom.yaml"
    assert config["vocoder_name"] == "bigvgan"
    assert config["target_rms"] == pytest.approx(0.12)
    assert config["device"] == "tpu"


def test_infer_cli_rejects_cuda_device():
    with pytest.raises(ValueError, match="device"):
        run({"gen_text": "hi.", "device": "cuda",
             "output_dir": "/tmp", "output_file": "x.wav", "ref_audio": "x.wav"})


def test_infer_cli_rejects_constructor_flags_with_prebuilt_wrapper(wrapper):
    """Constructor-only knobs (target_rms, vocoder_name, ...) cannot apply to a
    pre-built wrapper — loud error instead of the old silent ignore."""
    with pytest.raises(ValueError, match="target_rms"):
        run({"gen_text": "hi.", "target_rms": 0.12, "output_dir": "/tmp",
             "output_file": "x.wav", "ref_audio": "x.wav"}, wrapper=wrapper)


def test_api_rejects_unsupported_knobs():
    from eraxvif5tts_tpu.infer.api import F5TTS

    with pytest.raises(ValueError, match="ode_method"):
        F5TTS(ode_method="midpoint")
    with pytest.raises(ValueError, match="device"):
        F5TTS(device="cuda")
    with pytest.raises(ValueError, match="hf_cache_dir"):
        F5TTS(hf_cache_dir="/tmp/hf")


def test_speech_edit_cli_span_parsing():
    from eraxvif5tts_tpu.infer.speech_edit import parse_spans

    assert parse_spans("1.5:2.7,4.0:4.8") == [(1.5, 2.7), (4.0, 4.8)]
    with pytest.raises(ValueError, match="start:end"):
        parse_spans("1.5-2.7")
