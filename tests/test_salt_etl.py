"""CoreaSpeech "salt" ETL parity: pronunciation-column -> allophone modes.

Golden oracle: the reference's converter functions are 20-line compositions of
f5_tts.model.utils primitives (prepare_coreaspeech_salt_n.py:30-50,
prepare_coreaspeech_salt_vcp.py:35-54); this test rebuilds them verbatim from
the ACTUAL reference primitives (imported from /root/reference under the same
stubs as test_reference_oracle) and pins byte-for-byte token parity.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_oracle import _install_stubs  # noqa: E402

SAMPLES = [
    "감사함니다",            # g2p-style pronunciation, one eojeol
    "안녕하세요 저는 미나임니다",  # multi-eojeol
    "시간 엄써요!",          # palatalisation candidate (ㅅ+ㅣ) + punctuation
    "음… 그래요",            # non-Hangul ellipsis passthrough
    "같이 가치 감 빵",        # codas: ㅁ (nasal, in PHONEMES_N) and ㅇ
    "닭 값 왜요?",           # bare-consonant coda variety
]


def _ref_salt(text: str, use_skip_tc: bool, mode: str):
    _install_stubs()
    from f5_tts.model.utils import (
        PHONEMES_N,
        SKIPTC_TOKEN,
        _classify_into_allophones,
        _syllable_to_phonemes,
    )

    result = []
    for eojeol in text.split(" "):
        for j, syllable in enumerate(eojeol):
            phonemes = _syllable_to_phonemes(syllable)
            if mode == "n":
                allophones = _classify_into_allophones(
                    phonemes, is_eojeol_initial=(j == 0),
                    add_empty_jong=use_skip_tc, skip_tc_token=SKIPTC_TOKEN,
                    apply_init=False, apply_pal=False, apply_coda=True,
                    coda_filter=PHONEMES_N,
                )
            else:
                allophones = _classify_into_allophones(
                    phonemes, is_eojeol_initial=(j == 0),
                    add_empty_jong=use_skip_tc, skip_tc_token=SKIPTC_TOKEN,
                    apply_init=True, apply_pal=True, apply_coda=True,
                    coda_filter=None,
                )
            result.extend(allophones)
        result.append(" ")
    if result and result[-1] == " ":
        result.pop()
    return result


class TestSaltConverterParity:
    @pytest.mark.parametrize("use_skip_tc", [False, True])
    def test_salt_n_matches_reference(self, use_skip_tc):
        from korean_f5_tts_tpu.text.korean import convert_pronunciation_to_salt_n

        got = convert_pronunciation_to_salt_n(SAMPLES, use_skip_tc=use_skip_tc)
        for text, toks in zip(SAMPLES, got):
            assert toks == _ref_salt(text, use_skip_tc, "n"), text

    @pytest.mark.parametrize("use_skip_tc", [False, True])
    def test_salt_vcp_matches_reference(self, use_skip_tc):
        from korean_f5_tts_tpu.text.korean import convert_pronunciation_to_salt_vcp

        got = convert_pronunciation_to_salt_vcp(SAMPLES, use_skip_tc=use_skip_tc)
        for text, toks in zip(SAMPLES, got):
            assert toks == _ref_salt(text, use_skip_tc, "vcp"), text

    def test_salt_skips_g2p(self):
        # '같이' as PRONUNCIATION must decompose literally (ㄱㅏㅌㅣ),
        # not run g2p (which would palatalise to 가치)
        from korean_f5_tts_tpu.text.korean import convert_pronunciation_to_salt_n

        toks = convert_pronunciation_to_salt_n(["같이"])[0]
        assert "ㅌ" in toks and "ㅊ" not in toks


class TestCoreaSpeechPipeline:
    def test_prepare_coreaspeech_salt(self, tmp_path):
        from scipy.io import wavfile

        from korean_f5_tts_tpu.train.datasets.prepare import prepare

        root = tmp_path / "corpus"
        root.mkdir()
        sr = 24_000
        lines = []
        for i, pron in enumerate(["감사함니다", "안녕하세요 저는 미나임니다"]):
            wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
            name = f"clip{i}.wav"
            wavfile.write(str(root / name), sr, (wav * 32767).astype(np.int16))
            lines.append(f"{name}|표시 텍스트 {i}|정규화 {i}|{pron}")
        (root / "metadata_train.txt").write_text("\n".join(lines), encoding="utf-8")

        out = prepare(str(root), "corea", "kor_salt_n",
                      corpus_format="coreaspeech", use_skip_tc=True,
                      data_dir=str(tmp_path / "data"))
        assert os.path.exists(os.path.join(out, "raw.arrow"))
        assert os.path.exists(os.path.join(out, "duration.json"))
        vocab = open(os.path.join(out, "vocab.txt"), encoding="utf-8").read().splitlines()
        assert "*" in vocab  # skipTC boundary token made it into the vocab
        assert "ㅁᶜ" in vocab  # nasal coda allophone from 감/함
        assert not any("ⁱ" in v for v in vocab)  # salt-n never marks initials
