"""Golden tests for N2gk / N2gk+ normalisation and the tokenizer dispatch."""

import numpy as np
import pytest

from korean_f5_tts_tpu.text.normalization import (
    N2gk,
    N2gkPlus,
    normalize_n2gk_plus,
    read_native,
    read_sino,
    read_with_unit,
)
from korean_f5_tts_tpu.text.vocab import (
    detect_tokenizer_type,
    list_str_to_idx,
    list_str_to_tensor,
    tokenize_text,
)


class TestSinoReading:
    @pytest.mark.parametrize(
        "num,expected",
        [
            (0, "영"),
            (1, "일"),
            (10, "십"),
            (11, "십일"),
            (21, "이십일"),
            (100, "백"),
            (1000, "천"),
            (10000, "만"),
            (12345, "만이천삼백사십오"),
            (100000000, "일억"),
            (1234567, "백이십삼만사천오백육십칠"),
            (-5, "마이너스 오"),
        ],
    )
    def test_natural(self, num, expected):
        assert read_sino(num) == expected

    def test_formal_mode_keeps_ones(self):
        # natural=False reads leading 일 for small units but drops for 억+
        assert read_sino(100, natural=False) == "일백"
        assert read_sino(100000000, natural=False) == "억"

    def test_float(self):
        assert read_sino(3.14) == "삼점일사"
        assert read_sino(0.5) == "영점오"

    def test_too_large_passthrough(self):
        assert read_sino(10**21) == str(10**21)


class TestNativeReading:
    @pytest.mark.parametrize(
        "num,plain,prefix",
        [
            (1, "하나", "한"),
            (2, "둘", "두"),
            (3, "셋", "세"),
            (10, "열", "열"),
            (20, "스물", "스무"),
            (21, "스물하나", "스물한"),
            (99, "아흔아홉", "아흔아홉"),
        ],
    )
    def test_values(self, num, plain, prefix):
        assert read_native(num) == plain
        assert read_native(num, prefix=True) == prefix


class TestN2gk:
    def setup_method(self):
        self.n = N2gk()

    @pytest.mark.parametrize(
        "text,expected",
        [
            ("3명", "세명"),
            ("5개", "다섯개"),
            ("2시간", "두시간"),
            ("10년", "십년"),
            ("50퍼센트", "오십퍼센트"),
            ("100원", "백원"),
            ("3kg", "삼킬로그램"),
            ("25살", "스물다섯살"),
            ("20살", "스무 살"),  # exception idiom
            ("1등", "일 등"),  # exception idiom
            ("6월", "유월"),
            ("10월", "시월"),
            ("42", "사십이"),
            ("1,234", "천이백삼십사"),
            ("3.5", "삼점오"),
            ("010-1234-5678", "공일공-일이삼사-오육칠팔"),
            ("2~3개", "두에서 세 개"),
        ],
    )
    def test_goldens(self, text, expected):
        assert self.n(text) == expected

    def test_mixed_sentence(self):
        assert self.n("사과 3개 주세요") == "사과 세개 주세요"

    def test_english_number(self):
        assert self.n("mp3 파일") == "mp 쓰리 파일"


class TestN2gkPlus:
    def setup_method(self):
        self.n = N2gkPlus()

    def test_symbol_spelling(self):
        assert "퍼센트" in self.n("50% 할인")

    def test_removes_parentheses(self):
        assert self.n("서울(Seoul)입니다") == "서울입니다"

    def test_single_letters(self):
        out = self.n("A급")
        assert out == "에이 급"

    def test_jamo_names(self):
        assert self.n("ㄱ과 ㄴ") == "기역과 니은"

    def test_history_event(self):
        out = self.n("5.18 민주화 운동")
        assert out.startswith("오일팔")

    def test_corona(self):
        assert "일구" in self.n("코로나19 시대")

    def test_singleton(self):
        assert normalize_n2gk_plus("3개") == "세개"


class TestVocabLayer:
    def test_list_str_to_idx(self):
        vocab = {" ": 0, "a": 1, "b": 2}
        out = list_str_to_idx([["a", "b"], ["b"]], vocab)
        np.testing.assert_array_equal(out, [[1, 2], [2, -1]])
        # unknown -> 0
        out = list_str_to_idx([["z"]], vocab)
        np.testing.assert_array_equal(out, [[0]])

    def test_list_str_to_tensor(self):
        out = list_str_to_tensor(["ab", "a"])
        np.testing.assert_array_equal(out, [[97, 98], [97, -1]])

    def test_detect_tokenizer_type(self):
        assert detect_tokenizer_type({"ㄱⁱ": 1}) == "kor_allophone"
        assert detect_tokenizer_type({"ㄱ": 1}) == "kor_phoneme"
        assert detect_tokenizer_type({"ㅄ": 1}) == "kor_grapheme"
        assert detect_tokenizer_type({"a": 1}) == "pinyin"

    def test_dispatch_allophone(self):
        vocab = {"ㄱⁱ": 1, " ": 0}
        out = tokenize_text(["국밥"], tokenizer_type="custom", vocab=vocab, use_n2gk_plus=False)
        assert out[0][0] == "ㄱⁱ"

    def test_dispatch_with_n2gk(self):
        vocab = {"ㄱ": 1, " ": 0}
        out = tokenize_text(["3개"], tokenizer_type="kor_phoneme", vocab=vocab)
        # 3개 -> 세개 -> ㅅ ㅔ ㄱ ㅐ
        assert out[0] == ["ㅅ", "ㅔ", "ㄱ", "ㅐ"]

    def test_dispatch_skip_tc_legacy(self):
        vocab = {"ㄱ": 1, " ": 0}
        out = tokenize_text(
            ["가"], tokenizer_type="kor_grapheme", vocab=vocab,
            use_n2gk_plus=False, use_skip_tc=True, legacy=True,
        )
        assert out[0] == ["ㄱ", "ㅏ", ""]

    def test_dispatch_no_vocab_falls_to_pinyin(self):
        out = tokenize_text(["hello"], vocab=None)
        assert out[0] == list("hello")
