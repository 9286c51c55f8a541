"""Round-2 long-tail components: n-gram distribution analysis, KUB eval
variant, voice-chat session core."""

import numpy as np
import pytest

from korean_f5_tts_tpu.scripts.analyze_ngram_dist import (
    analyze_all,
    gini,
    ngram_stats,
    renyi_entropy,
    shannon_entropy,
)


class TestNgramMetrics:
    def test_gini_uniform_vs_concentrated(self):
        from collections import Counter

        uniform = Counter({c: 10 for c in "abcdefghij"})
        skewed = Counter({"a": 91, **{c: 1 for c in "bcdefghij"}})
        assert gini(uniform) == pytest.approx(0.0, abs=1e-9)
        assert gini(skewed) > 0.7
        assert gini(Counter()) == 0.0

    def test_entropies(self):
        from collections import Counter

        c = Counter({"a": 1, "b": 1, "c": 1, "d": 1})
        assert shannon_entropy(c) == pytest.approx(2.0, abs=1e-6)
        # Renyi of a uniform distribution equals Shannon for any alpha
        assert renyi_entropy(c, 2.5) == pytest.approx(2.0, abs=1e-6)

    def test_ngram_stats_filters_ignored_tokens(self):
        rows = [list("ab ab."), list("abab")]
        stats = ngram_stats(rows)
        # spaces and '.' excluded from all counts
        assert stats[1]["vocab"] == 2
        assert stats[1]["count"] == 8
        assert stats[2]["vocab"] <= 3
        assert 0 <= stats[1]["gini"] <= 1
        assert stats[1]["eff"] > 0

    def test_analyze_dataset_from_arrow(self, tmp_path):
        import pyarrow as pa

        from korean_f5_tts_tpu.scripts.analyze_ngram_dist import analyze_dataset

        d = tmp_path / "KSS_test_kor_phoneme"
        d.mkdir()
        table = pa.table({"text": [list("ㄱㅏㄴㅏ"), list("ㄴㅏㄱㅏ")],
                          "audio_path": ["a", "b"], "duration": [1.0, 1.0]})
        with pa.OSFile(str(d / "raw.arrow"), "wb") as sink:
            with pa.ipc.new_stream(sink, table.schema) as w:
                w.write_table(table)
        stats = analyze_dataset("KSS_test_kor_phoneme", data_root=str(tmp_path),
                                silent=True)
        assert stats[1]["vocab"] == 3  # ㄱ ㅏ ㄴ
        rows = analyze_all(["KSS_test_kor_phoneme", "missing_ds"],
                           data_root=str(tmp_path),
                           out_csv=str(tmp_path / "summary.csv"))
        assert len(rows) == 1 and (tmp_path / "summary.csv").exists()


class TestKubEval:
    def test_parse_kub_line(self):
        from korean_f5_tts_tpu.eval.evaluate_kub import parse_kub_line

        item = parse_kub_line(
            "clean|refs/a.wav|안녕하세요|3.2|gt/a.wav|반갑습니다\n")
        assert item == {"subset": "clean", "ref_wav": "refs/a.wav",
                        "ref_text": "안녕하세요", "ref_duration": 3.2,
                        "gt_wav": "gt/a.wav", "target_text": "반갑습니다"}
        assert parse_kub_line("bad|line\n") is None
        assert parse_kub_line("a|b|c|not_a_float|e|f\n") is None

    def test_evaluate_kub_end_to_end(self, tmp_path):
        """Full loop on a tiny model with injected ASR/MOS/embed backends,
        incl. resume and per-subset summary."""
        import jax

        from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
        from korean_f5_tts_tpu.eval.evaluate_kub import (
            evaluate_kub,
            load_test_items,
            summarize_by_subset,
        )
        from korean_f5_tts_tpu.infer.model import load_model
        from korean_f5_tts_tpu.utils.audio import save_wav

        sr = 24_000
        rng = np.random.default_rng(0)
        data_root = tmp_path / "data"
        (data_root / "refs").mkdir(parents=True)
        for name in ("r0.wav", "g0.wav", "r1.wav", "g1.wav"):
            save_wav(str(data_root / "refs" / name),
                     (0.2 * np.sin(2 * np.pi * 220 *
                                   np.arange(sr) / sr)).astype(np.float32), sr)
        test_list = tmp_path / "kub.txt"
        test_list.write_text(
            "# comment\n"
            "clean|refs/r0.wav|hello there|1.0|refs/g0.wav|one sentence.\n"
            "noisy|refs/r1.wav|hello again|1.0|refs/g1.wav|two sentence.\n",
            encoding="utf-8")
        items = load_test_items(str(test_list))
        assert len(items) == 2

        arch = DiTConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                         mel_dim=100, text_num_embeds=40, text_dim=16,
                         conv_layers=0)
        model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                       tokenizer="custom"), use_n2gk_plus=False)
        model.vocab_char_map = {c: i for i, c in
                                enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
        out_dir = str(tmp_path / "out")
        records = evaluate_kub(
            model, None, items, str(data_root), out_dir, nfe_step=2, seed=0,
            transcribe_fn=lambda p: "one sentence.",
            mos_fn=lambda p: 3.5,
            embed_fn=lambda p: rng.standard_normal(8),
        )
        assert len(records) == 2
        summary = summarize_by_subset(records, mode="m", step=10)
        assert {r["subset"] for r in summary} == {"clean", "noisy"}
        clean = next(r for r in summary if r["subset"] == "clean")
        assert clean["cer"] == 0.0 and clean["utmos"] == 3.5
        # resume: second call skips everything already in details.csv
        records2 = evaluate_kub(model, None, items, str(data_root), out_dir,
                                nfe_step=2, transcribe_fn=lambda p: "x")
        assert len(records2) == 2
        assert records2[0]["hyp_text"] == "one sentence."


class TestVoiceChatSession:
    def test_conversation_flow(self):
        from korean_f5_tts_tpu.infer.infer_gradio import VoiceChatSession

        seen = []

        def chat_fn(messages):
            seen.append([m["role"] for m in messages])
            return f"reply#{len(seen)}"

        s = VoiceChatSession(chat_fn, system_prompt="be brief")
        assert s.process_audio_input(None, "") is None
        assert s.process_audio_input(None, "hello") == "hello"
        assert s.generate_text_response() == "reply#1"
        assert seen[0] == ["system", "user"]
        s.process_audio_input(None, "more")
        s.generate_text_response()
        assert seen[1] == ["system", "user", "assistant", "user"]
        assert [m["role"] for m in s.conversation] == [
            "user", "assistant", "user", "assistant"]
        # no model_obj: audio generation gracefully returns None
        assert s.generate_audio_response("ref.wav", "ref") is None
        s.clear()
        assert s.conversation == []

    def test_audio_turn_uses_asr_backend(self, tmp_path):
        from korean_f5_tts_tpu.infer import utils_infer
        from korean_f5_tts_tpu.infer.infer_gradio import VoiceChatSession
        from korean_f5_tts_tpu.utils.audio import save_wav

        sr = 24_000
        wav_path = str(tmp_path / "u.wav")
        save_wav(wav_path, (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
                            ).astype(np.float32), sr)
        old = utils_infer._asr_backend
        utils_infer.set_asr_backend(lambda p, language=None: "spoken words")
        try:
            s = VoiceChatSession(lambda m: "ok")
            out = s.process_audio_input(wav_path, "")
            assert "spoken words" in out
        finally:
            utils_infer._asr_backend = old

    def test_chat_model_inference_contract(self):
        """chat_model_inference against a stub tokenizer/model pair."""
        torch = pytest.importorskip("torch")

        from korean_f5_tts_tpu.infer.infer_gradio import chat_model_inference

        class Tok:
            def apply_chat_template(self, messages, tokenize, add_generation_prompt):
                assert add_generation_prompt and not tokenize
                return " ".join(m["content"] for m in messages)

            def __call__(self, texts, return_tensors):
                class Batch(dict):
                    input_ids = torch.tensor([[1, 2, 3]])

                    def to(self, device):
                        return self

                return Batch(input_ids=torch.tensor([[1, 2, 3]]))

            def batch_decode(self, ids, skip_special_tokens):
                return ["decoded:" + ",".join(str(int(i)) for i in ids[0])]

        class Model:
            device = "cpu"

            def generate(self, input_ids=None, **kw):
                return torch.tensor([[1, 2, 3, 7, 8]])

        out = chat_model_inference([{"role": "user", "content": "hi"}],
                                   Model(), Tok())
        assert out == "decoded:7,8"
