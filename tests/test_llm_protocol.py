"""LLM post-correction protocol tests (reference LLM_functions.py).

Fake-LLM unit tests locking the full 9-rule protocol port: prompt content
(weights/banned words/conservation/pain disambiguation/小护 coercion +
changed flag), client-side banned-word enforcement, matches
validation/normalization, context-bearing correction, and the
process_speech_result tuple contract."""
import json

import pytest

from toolbox_for_asr_and_tts_tpu.llm import correction as C


@pytest.fixture
def corrector():
    return C.LLMCorrector(base_url="http://fake")


def fake_call(reply):
    """A _call stand-in that records the prompt and returns `reply`."""
    calls = []

    def _call(messages):
        calls.append(messages)
        return reply
    _call.calls = calls
    return _call


# ------------------------------------------------------------ prompt rules
def test_prompt_carries_all_nine_rules():
    p = C.build_prompt(None, ["心悸 20", "那个 -10"], "原句")
    # rule markers, one probe per rule
    assert "最小" in p                      # 1 minimal edit
    assert "咯血" in p and "呕血" in p       # 2/6 bleeding-type conservation
    assert "热词" in p                      # 3 hotword priority
    assert "权重" in p and "禁止" in p       # 4 weight semantics + ban
    assert "部位" in p                      # 6 body-part conservation
    assert "绞痛" in p and "脚痛" in p       # 7 pain-phrase disambiguation
    assert "标点" in p                      # 8 punctuation cleanup
    assert "小护" in p and "小虎" in p       # 9 xiaohu coercion
    assert '"changed"' in p                 # output contract
    # inputs present in the documented layout
    assert "- 心悸 20" in p and "- 那个 -10" in p
    assert "'原句'" in p


def test_prompt_includes_context_lines():
    ctx = [{"role": "user", "content": "胸口不舒服"},
           {"role": "assistant", "content": "请描述疼痛性质"}]
    p = C.build_prompt(ctx, [], "句子")
    assert "user: 胸口不舒服" in p
    assert "assistant: 请描述疼痛性质" in p


def test_weighted_options_reach_the_prompt(corrector, monkeypatch):
    call = fake_call(json.dumps({"corrected": "文本", "changed": False}))
    monkeypatch.setattr(corrector, "_call", call)
    corrector.correct_text_only(["心悸 20", "那个 -10"], "文本")
    prompt = call.calls[0][0]["content"]
    assert "- 心悸 20" in prompt and "- 那个 -10" in prompt
    assert "/nothink" in prompt


# ------------------------------------------------- banned-word enforcement
def test_banned_word_introduced_rejects_correction(corrector, monkeypatch):
    monkeypatch.setattr(corrector, "_call", fake_call(
        json.dumps({"corrected": "然后我头疼", "changed": True})))
    out = corrector.correct_text_only(["头疼 20", "然后 -5"], "我头疼")
    assert out == "我头疼"          # 然后 was introduced → whole edit rejected


def test_banned_word_already_present_does_not_block(corrector, monkeypatch):
    monkeypatch.setattr(corrector, "_call", fake_call(
        json.dumps({"corrected": "然后我心悸", "changed": True})))
    out = corrector.correct_text_only(["心悸 20", "然后 -5"], "然后我心机")
    assert out == "然后我心悸"      # ban guards introductions only


def test_banned_words_from_options():
    assert C.banned_words_from_options(
        ["心悸 20", "那个 -10", "无权重", "bad weight x"]) == ["那个"]


# ------------------------------------------------------- matches validation
def test_matches_exact_and_fuzzy_and_dropped():
    opts = ["挂号", "缴费窗口", "放射科"]
    got = C.validate_matches(["挂号", "缴费 窗口", "火星科室", 42], opts)
    assert got == ["挂号", "缴费窗口"]      # exact, normalized-fuzzy; rest dropped


def test_matches_dedup_preserves_order():
    opts = ["挂号", "缴费"]
    assert C.validate_matches(["缴费", "挂号", "缴费"], opts) == ["缴费", "挂号"]


def test_matches_strip_weights_from_weighted_options():
    # options are load_hotword_options "word weight" lines — the weight
    # digits must NOT leak into the match strings (prompt rule 4)
    opts = ["心悸 20", "胸痛 15", "头晕 -5"]
    assert C.validate_matches(["心悸", "胸痛 15"], opts) == ["心悸", "胸痛"]
    # dedup applies to the bare word, not the raw option line
    assert C.validate_matches(["心悸", "心悸 20"], opts) == ["心悸"]


def test_unvalidated_model_matches_are_dropped(corrector, monkeypatch):
    monkeypatch.setattr(corrector, "_call", fake_call(json.dumps(
        {"corrected": "去缴费", "matches": ["不存在的选项"]})))
    parsed = corrector.process_with_context(None, ["挂号", "放射科"], "去缴费")
    assert parsed["matches"] == []
    assert parsed["has_match"] is False
    assert parsed["error"] == "model_matches_not_validated"


def test_validated_matches_survive(corrector, monkeypatch):
    monkeypatch.setattr(corrector, "_call", fake_call(json.dumps(
        {"corrected": "我要挂号", "matches": ["挂号"]})))
    parsed = corrector.process_with_context(None, ["挂号", "缴费"], "我要挂号")
    assert parsed["matches"] == ["挂号"]
    assert parsed["has_match"] is True and parsed["error"] is None


# ------------------------------------------------------------ parse layers
def test_parse_model_output_json():
    r = C.parse_model_output(
        '{"corrected": "对", "changed": true, "matches": ["a"]}', "原")
    assert r["success"] and r["corrected"] == "对" and r["changed"] is True
    assert r["matched_via"] == "model"


def test_parse_model_output_regex_fallback():
    raw = 'garbage "corrected": "修好了", "matches": ["挂号", "缴费"] trailing'
    r = C.parse_model_output(raw, "原")
    assert r["success"] and r["corrected"] == "修好了"
    assert r["matches"] == ["挂号", "缴费"]
    assert r["matched_via"] == "regex"


def test_parse_model_output_failure():
    r = C.parse_model_output("no json here", "原文")
    assert not r["success"] and r["corrected"] == "原文"
    assert r["matched_via"] == "none"


def test_extract_json_fenced_block():
    assert C._extract_json('```json\n{"a": 1}\n```') == {"a": 1}
    assert C._extract_json('prefix {"b": 2} suffix') == {"b": 2}


def test_parse_model_output_uses_fence_extraction():
    # a server that ignores response_format wraps the JSON in a code fence:
    # the full parse (incl. `changed`) must survive, not the regex scrape
    raw = '```json\n{"corrected": "挂号", "changed": true, "matches": []}\n```'
    r = C.parse_model_output(raw, "原")
    assert r["matched_via"] == "model" and r["changed"] is True
    assert r["corrected"] == "挂号" and r["error"] is None


def test_regex_scrape_unescapes_chinese_without_mojibake():
    # non-ASCII text with a backslash escape must decode as JSON would —
    # unicode_escape on the UTF-8 bytes would produce Latin-1 mojibake
    raw = 'oops "corrected": "胸痛\\n不适", "matches": ["\\u632a\\u52a8"]'
    r = C.parse_model_output(raw, "原")
    assert r["corrected"] == "胸痛\n不适"
    assert r["matches"] == ["挪动"]


# -------------------------------------------------------- public surface
def test_process_speech_result_tuple(monkeypatch):
    monkeypatch.setattr(C._default, "_call", fake_call(json.dumps(
        {"corrected": "去挂号", "matches": ["挂号", "缴费"]})))
    monkeypatch.setattr(C._default, "base_url", "http://fake")
    match_string, corrected = C.process_speech_result(
        latest_options=["挂号", "缴费"], text="去挂号")
    assert corrected == "去挂号"
    assert match_string == '挂号", "缴费'   # the reference's join format


def test_process_speech_result_empty_input():
    assert C.process_speech_result(latest_options=["x"], text="  ") == ("", "")


def test_correct_text_only_empty_input():
    assert C.correct_text_only(latest_options=["x"], text="") == ""


def test_load_hotword_options_carries_weights():
    opts = C.load_hotword_options(None)
    assert "小护 30" in opts
    assert any(o.endswith(" -10") for o in opts)    # banned words included


def test_load_hotwords_list_strips_banned():
    words = C.load_hotwords_list(None)
    assert "小护" in words and "那个" not in words


def test_context_passes_through_correct_text_only(monkeypatch):
    call = fake_call(json.dumps({"corrected": "好", "changed": False}))
    monkeypatch.setattr(C._default, "_call", call)
    monkeypatch.setattr(C._default, "base_url", "http://fake")
    C.correct_text_only(latest_context=[{"role": "user", "content": "背景句"}],
                        latest_options=[], text="好")
    assert "user: 背景句" in call.calls[0][0]["content"]
