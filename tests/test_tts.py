import time

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from toolbox_for_asr_and_tts_tpu.tts.text_frontend import (  # noqa: E402
    G2P,
    PhoneVocab,
    normalize_text,
    pause_after,
    split_pinyin,
    split_text_for_tts,
    text_to_phone_ids,
)
from toolbox_for_asr_and_tts_tpu.tts.concat import concat_segments, crossfade_concat  # noqa: E402
from toolbox_for_asr_and_tts_tpu.tts.synthesizer import Synthesizer  # noqa: E402
from toolbox_for_asr_and_tts_tpu.tts.jobs import TTSJobManager  # noqa: E402
from toolbox_for_asr_and_tts_tpu.models import sambert, hifigan  # noqa: E402


# --------------------------------------------------------- text frontend
def test_normalize_text_reference_semantics():
    assert normalize_text("a  b\t c") == "a b c"
    assert normalize_text("第一行\n\n第二行") == "第一行，第二行"
    assert normalize_text("你好\n世界") == "你好，世界"
    # number stripping applies at line starts only; mid-string numbers after
    # the newline→comma rewrite survive (matches the reference's rule order)
    assert normalize_text("1. 休息\n2. 喝水") == "休息，2. 喝水"
    assert normalize_text("1. 休息") == "休息"
    assert normalize_text("，，测试，，") == "测试"
    assert normalize_text("") == ""


def test_split_text_targets():
    text = "患者目前诊断为高血压和糖尿病。建议低盐低脂饮食，适量运动，定期监测血压和血糖。如有头晕头痛及时就诊。"
    segs = split_text_for_tts(text, target=18, first_target=14, hard_max=22)
    assert segs
    assert all(len(s) <= 23 for s in segs)  # hard_max + patched comma
    # non-final segments end with punctuation
    for s in segs[:-1]:
        assert s[-1] in "。！？；，、：\n"
    assert "".join(segs).replace("，", "") .startswith("患者目前诊断")


def test_split_long_run_hard_cut():
    text = "一" * 100
    segs = split_text_for_tts(text, 18, 14, 22)
    assert all(len(s) <= 23 for s in segs)
    assert sum(len(s.rstrip("，")) for s in segs) == 100


def test_pause_after():
    assert pause_after("你好。") == 200
    assert pause_after("你好，") == 120
    assert pause_after("你好") == 120


def test_split_pinyin():
    assert split_pinyin("zhong4") == ("zh", "ong", 4)
    assert split_pinyin("a1") == ("", "a", 1)
    assert split_pinyin("xiao3") == ("x", "iao", 3)
    # pinyin spelling rule: u after j/q/x/y is ü ('v' in the phone set)
    assert split_pinyin("xue4") == ("x", "ve", 4)
    assert split_pinyin("jue2") == ("j", "ve", 2)
    assert split_pinyin("yuan2") == ("y", "van", 2)
    assert split_pinyin("jun1") == ("j", "vn", 1)
    assert split_pinyin("qu4") == ("q", "v", 4)
    # real u-finals unaffected
    assert split_pinyin("dun4") == ("d", "un", 4)
    assert split_pinyin("wu3") == ("w", "u", 3)


def test_lexicon_no_unk():
    """Every word in the polyphone lexicon AND every char in the base
    pinyin table must encode without <unk> — caught the ü-final gap where
    血/觉/乐/全/军 all hit <unk> (round-2b)."""
    from toolbox_for_asr_and_tts_tpu.tts.polyphones import WORD_PINYIN
    from toolbox_for_asr_and_tts_tpu.tts.pinyin_data import PINYIN_TABLE
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import (
        G2P, PhoneVocab, text_to_phone_ids)
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import \
        _derived_word_lexicon
    g, vocab = G2P(), PhoneVocab.default()
    bad = []
    for w in (list(WORD_PINYIN) + list(PINYIN_TABLE)
              + list(_derived_word_lexicon())):
        syms = [vocab.symbols[i] for i in text_to_phone_ids(w, g, vocab)]
        if vocab.UNK in syms:
            bad.append((w, syms))
    assert not bad, bad[:10]


def test_g2p_and_vocab():
    g2p = G2P()
    vocab = PhoneVocab.default()
    ids = text_to_phone_ids("你好，小护。", g2p, vocab)
    assert len(ids) >= 6  # ni3 hao3 #br xiao3 hu4 #sil → ≥6 symbols
    assert all(0 <= i < len(vocab) for i in ids)
    # known chars should not map to <unk>
    known = text_to_phone_ids("你好", g2p, vocab)
    assert vocab.to_id["<unk>"] not in known


def test_g2p_fallback_unknown_char():
    g2p = G2P()
    phones = g2p("㑇")  # not in seed lexicon
    assert phones[0].symbol.startswith("char_")


# ---------------------------------------------------------------- concat
def test_crossfade_concat_lengths():
    a = np.ones(100, np.float32)
    b = np.ones(80, np.float32) * -1
    out = crossfade_concat(a, b, 20)
    assert len(out) == 160
    assert abs(out[90 - 1]) <= 1.0  # inside fade region mixes


def test_concat_segments_pause():
    a = np.ones(1600, np.float32)
    b = np.ones(1600, np.float32)
    out = concat_segments([a, b], [100], sample_rate=16000, crossfade_ms=0)
    assert len(out) == 1600 + 1600 + 1600 * 0 + 1600  # 100ms = 1600 samples


# ------------------------------------------------------------ models
def test_length_regulate_static():
    x = jnp.arange(2 * 3 * 2, dtype=jnp.float32).reshape(2, 3, 2)
    dur = jnp.asarray([[2, 1, 3], [1, 0, 0]], jnp.int32)
    out, mask = sambert.length_regulate(x, dur, t_mel=8)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, 0], np.asarray(x[0, 0]))
    np.testing.assert_allclose(out[0, 1], np.asarray(x[0, 0]))
    np.testing.assert_allclose(out[0, 2], np.asarray(x[0, 1]))
    np.testing.assert_allclose(out[0, 3], np.asarray(x[0, 2]))
    assert np.asarray(mask)[0].sum() == 6
    assert np.asarray(mask)[1].sum() == 1


def test_hifigan_output_length():
    cfg = hifigan.HifiGanConfig(upsample_initial_channel=16,
                                resblock_kernels=(3,),
                                resblock_dilations=((1,),))
    params = hifigan.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, 10, 80))
    wav = hifigan.forward(params, mel, cfg)
    assert wav.shape == (1, 10 * cfg.hop_length)
    assert cfg.hop_length == 200


# --------------------------------------------------------- synthesizer
@pytest.fixture(scope="module")
def synth():
    return Synthesizer.random(tiny=True)


def test_synthesize_end_to_end(synth):
    res = synth.synthesize("你好，今天天气怎么样。血压正常。")
    assert res is not None
    assert res.wav.dtype == np.float32
    assert len(res.wav) > 16000 * 0.2  # produced audible-length audio
    assert np.abs(res.wav).max() <= 1.0
    assert res.rtf > 0
    assert len(res.segments) >= 1


def test_synthesize_empty(synth):
    res = synth.synthesize("")
    assert res is not None and len(res.wav) == 0


def test_job_manager_lifecycle(synth):
    mgr = TTSJobManager(synth, max_workers=2)
    job_id = mgr.start_task("你好。测试语音合成。")
    for _ in range(300):
        r = mgr.get_result(job_id)
        if r["status"] in ("completed", "error"):
            break
        time.sleep(0.1)
    assert r["status"] == "completed", r["error"]
    assert r["audio_base64"]
    assert r["detailed_timing"]["rtf"] > 0
    assert mgr.cleanup_job(job_id)
    assert mgr.get_result(job_id) is None


def test_job_ttl_sweep(synth):
    """Finished jobs older than the TTL are evicted on the next start/poll —
    clients that never DELETE must not grow memory without bound (round-2
    review finding; each finished job holds a multi-MB base64 WAV)."""
    mgr = TTSJobManager(synth, max_workers=1, job_ttl_s=0.2)
    job_id = mgr.start_task("你好。")
    for _ in range(300):
        r = mgr.get_result(job_id)
        if r["status"] in ("completed", "error"):
            break
        time.sleep(0.1)
    assert r["status"] == "completed"
    time.sleep(0.3)
    mgr.start_task("第二个任务。")     # triggers the sweep
    assert mgr.get_result(job_id) is None
    # pending/processing jobs are never swept
    assert mgr.active_jobs >= 0


def test_job_cancel(synth):
    mgr = TTSJobManager(synth, max_workers=1)
    a = mgr.start_task("一" * 200)
    b = mgr.start_task("二" * 200)  # queued behind a
    assert mgr.cancel_task(b)
    time.sleep(0.2)
    r = mgr.get_result(b)
    assert r["status"] == "cancelled"


# ---------------------------------------------------- G2P golden (round 2)
def test_g2p_golden_pinyin():
    """ttsfrd-parity rules: polyphones, 一/不 sandhi, third-tone chains,
    erhua (VERDICT round-1 item #7)."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    golden = {
        # 一 sandhi: yi2 before tone 4, yi4 before 1/2/3, yi1 in ordinals
        "一个": ["yi2", "ge4"],
        "一天": ["yi4", "tian1"],
        "一年": ["yi4", "nian2"],
        "第一名": ["di4", "yi1", "ming2"],
        # 不 sandhi: bu2 before tone 4 only
        "不是": ["bu2", "shi4"],
        "不好": ["bu4", "hao3"],
        "不能": ["bu4", "neng2"],
        # third-tone chains
        "很好": ["hen2", "hao3"],
        "可以": ["ke2", "yi3"],
        # polyphones
        "去银行": ["qu4", "yin2", "hang2"],
        "行走": ["xing2", "zou3"],
        "血压": ["xue4", "ya1"],
        "流血": ["liu2", "xie3"],
        "重要": ["zhong4", "yao4"],
        "重新": ["chong2", "xin1"],
        "音乐": ["yin1", "yue4"],
        "快乐": ["kuai4", "le4"],
        "睡觉": ["shui4", "jiao4"],
        "感觉": ["gan3", "jue2"],
        "头晕": ["tou2", "yun1"],
        "处方": ["chu3", "fang1"],
        "心脏": ["xin1", "zang4"],
        "恶心": ["e3", "xin1"],
        "便秘": ["bian4", "mi4"],
        "头发": ["tou2", "fa4"],
        "发烧": ["fa1", "shao1"],
        # round-2 extension: medical polyphones
        "中风": ["zhong4", "feng1"],
        "呕吐": ["ou3", "tu4"],
        "扎针": ["zha1", "zhen1"],
        "创伤": ["chuang1", "shang1"],
        "跌倒": ["die1", "dao3"],
        "量体温": ["liang2", "ti3", "wen1"],
        # round-2b polyphone families
        "冠心病": ["guan1", "xin1", "bing4"],
        "冠军": ["guan4", "jun1"],
        "症状": ["zheng4", "zhuang4"],
        "症结": ["zheng1", "jie2"],
        "粘膜": ["nian2", "mo2"],
        "粘贴": ["zhan1", "tie1"],
        "禁食": ["jin4", "shi2"],
        "不禁": ["bu4", "jin1"],
        "屏住": ["bing3", "zhu4"],
        "屏幕": ["ping2", "mu4"],
        "脑卒中": ["nao3", "cu4", "zhong4"],
        "荨麻疹": ["xun2", "ma2", "zhen3"],
        "血浆": ["xue4", "jiang1"],
        "扫描": ["sao3", "miao2"],
        "扫帚": ["sao4", "zhou5"],
        "尽量": ["jin3", "liang4"],
        "因为": ["yin1", "wei4"],
        "认为": ["ren4", "wei2"],
        "强迫": ["qiang3", "po4"],
        "增强": ["zeng1", "qiang2"],
        "落枕": ["lao4", "zhen3"],
        "咀嚼": ["ju3", "jue2"],
        "涂抹": ["tu2", "mo3"],
        "肚子": ["du4", "zi5"],
        "夹层": ["jia1", "ceng2"],
        # V一V / V不V neutral tone (round-2c)
        "看一看": ["kan4", "yi5", "kan4"],
        "试一试": ["shi4", "yi5", "shi4"],
        "好不好": ["hao3", "bu5", "hao3"],
        "数一数": ["shu3", "yi5", "shu3"],
        # erhua
        "一点儿": ["yi4", "dianr3"],
        "这儿": ["zher4"],
        "哪儿": ["nar3"],
        # 的 family (round-2 review finding: 目的/的确 read as particle de5)
        "目的": ["mu4", "di4"],
        "目的地": ["mu4", "di4", "di4"],
        "的确": ["di2", "que4"],
        "的士": ["di1", "shi4"],
        "我的书": ["wo3", "de5", "shu1"],
        # round-2d POS-dependent tail (roadmap #11)
        "孩子长得高": ["hai2", "zi5", "zhang3", "de5", "gao1"],
        "很长": ["hen3", "chang2"],
        "把钱还给我": ["ba3", "qian2", "huan2", "gei2", "wo3"],
        "还没好": ["hai2", "mei2", "hao3"],
        "首都": ["shou3", "du1"],
        "都很好": ["dou1", "hen2", "hao3"],
        "空调": ["kong1", "tiao2"],
        "调整音调": ["tiao2", "zheng3", "yin1", "diao4"],
        "相处": ["xiang1", "chu3"],
        "到处": ["dao4", "chu4"],
        "作为医生": ["zuo4", "wei2", "yi1", "sheng1"],
        "为了健康": ["wei4", "le5", "jian4", "kang1"],
        "一只手": ["yi4", "zhi1", "shou3"],
        "两只眼睛": ["liang3", "zhi1", "yan3", "jing1"],
        "只有": ["zhi2", "you3"],   # 3-3 sandhi on zhi3 you3
        "数了数": ["shu3", "le5", "shu3"],
        "薄荷": ["bo4", "he5"],
        "弹钢琴": ["tan2", "gang1", "qin2"],
        "子弹": ["zi3", "dan4"],
    }
    for text, want in golden.items():
        assert g.pinyin(text) == want, (text, g.pinyin(text), want)


def test_g2p_contextual_particles():
    """地/得/了 window rules (round-2c, roadmap #11): adverbial de5 vs noun
    di4, complement de5 vs modal dei3 vs attainment de2, liao3 vs le5 —
    ttsfrd resolves these with POS context; these are the dominant
    patterns as golden pinyin."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    golden = {
        # 地: AA地 / 地+verb → de5; nominal compounds stay di4
        "慢慢地走": ["man4", "man4", "de5", "zou3"],
        "认真地想": ["ren4", "zhen1", "de5", "xiang3"],
        "好好地休息": ["hao2", "hao3", "de5", "xiu1", "xi1"],
        "土地": ["tu3", "di4"],
        "场地打扫": ["chang3", "di4", "da2", "sao3"],  # 打扫 3-3 sandhi
        "地球": ["di4", "qiu2"],
        # 得: V+complement → de5, subject+V → dei3, attainment → de2
        "他跑得很快": ["ta1", "pao3", "de5", "hen3", "kuai4"],
        "你说得对": ["ni3", "shuo1", "de5", "dui4"],
        "我得去医院": ["wo2", "dei3", "qu4", "yi1", "yuan4"],
        "我们得抓紧": ["wo3", "men5", "dei3", "zhua1", "jin3"],
        "病人得吃药": ["bing4", "ren2", "dei3", "chi1", "yao4"],
        "得到结果": ["de2", "dao4", "jie2", "guo3"],
        "觉得": ["jue2", "de5"],
        # 了: 不+了 / clause-final 得了 → liao3; aspect le5 otherwise
        "受不了": ["shou4", "bu4", "liao3"],
        "吃不了": ["chi1", "bu4", "liao3"],
        "来得了吗": ["lai2", "de5", "liao3", "ma5"],
        "他得了感冒": ["ta1", "de2", "le5", "gan3", "mao4"],
        "好了": ["hao3", "le5"],
        # 着 default zhe5 after verbs; lexicalized zhao2/zhuo2 untouched
        "他看着我": ["ta1", "kan4", "zhe5", "wo3"],
        "着急": ["zhao2", "ji2"],
        "穿着整齐": ["chuan1", "zhuo2", "zheng3", "qi2"],
    }
    for text, want in golden.items():
        assert g.pinyin(text) == want, (text, g.pinyin(text), want)


def test_g2p_open_domain_coverage():
    """Round-2c lexicon expansion: ordinary sentences must not silently
    drop characters to char_<cp> fallbacks (round-1 table lacked 地/着/行/
    土/跑/受…)."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    sentences = [
        "今天天气很好，我们一起去公园散步吧。",
        "他把车停在楼下，然后坐电梯上来了。",
        "医生建议病人多喝水，按时吃药，注意休息。",
        "奶奶在厨房里煮汤，爸爸在客厅看电视。",
        "这件衣服太贵了，我们换一家店看看。",
        "火车马上就要开了，请大家抓紧时间上车。",
        "研究人员分析了大量数据，探索疾病发生的原因，编写了详细的报告。",
        "政府部门发布了新的通知，社区委员会组织居民参加健康讲座。",
        "王医生建议患者多吃新鲜蔬菜，注意营养均衡，适当参加户外运动。",
    ]
    for s in sentences:
        cjk = [ch for ch in s if "一" <= ch <= "鿿"]
        syls = g.pinyin(s)
        assert len(syls) == len(cjk), (s, len(syls), len(cjk), syls)


def test_g2p_round3d_coverage_batch():
    """Round-3d: the 3c blind eval showed the dominant miss class is chars
    with NO table entry at all. Every char in the ~320-char coverage batch
    must resolve to a real syllable, and the polyphones introduced with it
    must disambiguate through WORD_PINYIN."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    batch = (
        "丘丸仰伯侄侬俯俺倦傲兮兰冽凛凰凳凿剁劈叮吻咕咬哉啃喃嘀嘱嘲嚷坡垄"
        "堵填壤壶姑娘婉婶媳嫂寂寥尘屉屐岭峡峦峨崖嶂巍恋悔悟惭愧憨懊扇扑扛"
        "抚拇拌拽拾挖挚挡捡捣捶掀掌掐掘掰搀搂搓撕擀攥敷斓斟旎旖旬昼晒晾暮"
        "曙曦杈杏枣枫柏柚柳柿桃桦桩桶梅梢梨棘椒榴槐橙橱毡汐沼泉泞泵泼泽洋"
        "洞浩浸涌涛涧淌淳渺湾溅溜溪滚滨滩潭潮瀑瀚灶灸炖炸烘烛焉焚熄熏燎燕"
        "爹琢璀璨瓣畔疝痘痪痹瘀癣盆眉睫瞒瞳矣砌砸碟磅磕礁礴穗竹笋笼筐筛箩"
        "篦纱绊绒绚绢绣绸缎缸罐羞肘腌腕腱臀舀舔芦芹芽苇茎茫荆莓莲莺菇菊菠"
        "萝葱蒜蔓蕊蕾虚虹虾蚓蚕蚯蜗蝉蝶螂螳螺蟀蟋蟹衫裁褥讥讽诚诬诽谣谤谦"
        "谷豹贬趴跪跺踝踢蹬蹲辩迈逸遮酿钉铲链锤锦锯镂闩闯阀陋陵雀雁雅雕雹"
        "霁霞霭霾靴韧韭颊颚驳驴驼骄骆骡髓鲤鲨鲫鲸鳄鳖鳗鸥鸦鸽鹉鹊鹤鹦鹰麓"
    )
    for ch in batch:
        syls = g.pinyin(ch)
        assert len(syls) == 1 and not syls[0].startswith("char_"), (ch, syls)
    # polyphones introduced by the batch disambiguate in context
    cases = [
        ("厨师把油炸花生端了上来", "炸", "zha2"),
        ("远处传来爆炸的声音", "炸", "zha4"),
        ("这幅山水画气势磅礴", "磅", "pang2"),
        ("他用扇子扇风", None, None),  # both registers in one sentence
    ]
    for text, ch, want in cases:
        syls = g.pinyin(text)
        cjk = [c for c in text if "一" <= c <= "鿿"]
        assert len(syls) == len(cjk), (text, syls)
        if ch is not None:
            got = syls[cjk.index(ch)]
            assert got == want, (text, ch, got, want)
    # 扇子 shan4 (noun) vs 扇风 shan1 (verb) in the combined sentence
    syls = g.pinyin("他用扇子扇风")
    assert syls[2] == "shan4" and syls[4] == "shan1", syls


def test_g2p_erhua_phones_encode():
    """Rhotic finals are first-class vocab symbols (dianr3 etc.)."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import (G2P, PhoneVocab,
                                                               text_to_phone_ids)
    vocab = PhoneVocab.default()
    ids = text_to_phone_ids("一点儿", G2P(), vocab)
    syms = [vocab.symbols[i] for i in ids]
    assert "ianr3" in syms, syms
    assert vocab.to_id["ianr3"] != vocab.to_id[vocab.UNK]


def test_synthesizer_mesh_matches_single_device():
    """dp-sharded synthesis over the 8-device mesh == single device, for a
    segment count that is NOT a device multiple (padding rows dropped)."""
    s1 = Synthesizer.random(seed=3)
    s8 = Synthesizer.random(seed=3, use_mesh=True)
    assert s8.mesh is not None and s8.mesh.devices.size == 8
    segs = ["你好。", "今天天气不错。", "请按时吃药。"]  # 3 rows → pad to 8
    w1, d1 = s1.synthesize_segments(segs, "zhitian_emo")
    w8, d8 = s8.synthesize_segments(segs, "zhitian_emo")
    assert d1 == d8
    for a, b in zip(w1, w8):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_g2p_round3e_coverage_batch():
    """Round-3e: collation-group sweep of the remaining common chars (298
    group-vote defaults + 151 hand-authored + 6 vote overrides). Every char
    must resolve to a real syllable; the polyphones introduced with the
    batch (and the two table corrections 喂/膀) disambiguate via
    WORD_PINYIN."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    batch = (
        "丈丛丝丰丹丽乃乾亏井亚亦享亭仁仇仗仙仪企伊伍伎伐伟伦估伸佩佳侍侠侵俄"
        "俊俘俩俱倘倾偷催僧兽冈冶凝凡凯刑券剉副努勇勒勤勾匆匠华卑却叛召吊吏君"
        "吹呆呈咐咨哩哲啦嘉圣坛坦垂垸埃培堂堡堤堪堰塔墓墨壁央夷夺奈奏套奥奴奸"
        "妃妖妙姆姊威娃娜婀孝宇宏宗宪寄寡寨寺寻寿封尊尖尸尼屈岂岗岩岳崇巡巨帅"
        "帐帝席幸幽庄庙廊廷弦役彻彼征徒御德徽忍忙忠恩恭恰悉悠悬惜愤慈慕慰托扯"
        "披拔拥拦拱拳挥捷掩措揭援搜携摄摇摩撤敌敢敦敬斗斜斯旨昆昌晋晓晶暗曰曼"
        "杀杖杭杰枚枢枪柔柴栏桂桑械棋棒棺榜欣欧欺残殑殖殷殿毁氏氨汝沿泛波泰洛"
        "津洲浓浙浜浠涉涓淮渔渠湘溶滋漆漫潜澳灵炮煤熙熟牌牧牲牵犹狂狮狱猎猛献"
        "玄珍瑞甘甚申畅畜番疆疏皆皇盈盟盾督瞎瞧矛矿砖碑碳祖祝祥祸福禺私秉稀稿"
        "穆窝竟筋筑筹箭籍粮紝纤纬纲纳纵纷纺纽缘罚罢翼耀耐耶职聚肃肯胁脊腊腔臣"
        "舌舰艇艘艰艺芳茅荒荡荣莱菲萨著葬蒙薪藕藻衙袭襄誉订诏诸谋谓谱豪豫貌贡"
        "财贤贯贷贼赋赏赤赫赴趋践踏踪轰轴辆辈辉辖辞辟辨辱辽迅违迪迷迹逐逼遂遇"
        "遣遥遭邀邦邪郊郎郡鄂野鉴銆鐨锋锛锡阁阅阔阶陕陶陷隆隶雄霍靖鞭韦顷颁颇"
        "颗飘饰驰驱鬼魂魔鲁鸿"
    )
    for ch in batch:
        syls = g.pinyin(ch)
        assert len(syls) == 1 and not syls[0].startswith("char_"), (ch, syls)
    cases = [
        ("他的肩膀受伤了", "膀", "bang3"),        # corrected table default
        ("膀胱是储存尿液的器官", "膀", "pang2"),   # compound keeps pang2
        ("喂，请问是王医生吗", "喂", "wei4"),      # corrected table default
        ("北斗七星挂在夜空", "斗", "dou3"),
        ("他们为理想而斗争", "斗", "dou4"),
        ("牧民以畜牧为生", "畜", "xu4"),
        ("圈里养着许多牲畜", "畜", "chu4"),
        ("这是骗子惯用的伎俩", "俩", "liang3"),
        ("他们俩是好朋友", "俩", "lia3"),
        # (蒙古 meng3 surfaces as meng2 via 3-3 sandhi — not observable here)
        ("不要蒙骗消费者", "蒙", "meng1"),
        ("他办事很踏实", "踏", "ta1"),
        ("士兵踏步前进", "踏", "ta4"),
        ("伤口渗出殷红的血", "殷", "yan1"),
        ("店主殷勤地招待客人", "殷", "yin1"),
    ]
    for text, ch, want in cases:
        syls = g.pinyin(text)
        cjk = [c for c in text if "一" <= c <= "鿿"]
        assert len(syls) == len(cjk), (text, syls)
        got = syls[cjk.index(ch)]
        assert got == want, (text, ch, got, want)


def test_g2p_round3f_coverage_batch():
    """Round-3f: closes the jieba frequency-ranked top-2500 (312 chars;
    201 collation-group vote + 8 polyphone-voter overrides + 111
    hand-authored). Every char resolves; batch polyphones disambiguate."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    batch = (
        "丐丞丫亥仆仲伪佐佣佸侦侨俞倡傻僚僭儒兑兹冤冻凑刃劣劫勃勋匈匾卓卦卿厦"
        "厮叩吟吩呵哊哨唇喀喇喻嗣嘿坑坝坟坤塘墩夕契奠妄妥妨姻姿娇娱嫌宅宙宛宠"
        "宰宴宸尉屁屠屡履屯屼屽屾峻崩巩帖幻庞庸廉弓弗彪怔怖怜恼悦惑惟惩惹愚慎"
        "慨戈扮押拐拓挪挽捐捞捧掏掠掷摊摘撑撰擒攀斋斥斩旭旱昂昔昭朕朴杉杩枯柄"
        "柯栖株栽桐棍棚棣槸槽檐歼毅氛氢氯沃沔沪泌洒浣浦涔涵渊渴滞澶炭焕煌熔爪"
        "爵爽牺狭玛珊珞琉瑜瑶璇璋瓷甫甸畴疯皱盯盲瞪矩砂硅硕硫碧碱磷祀祯禀禅禧"
        "秩稷稻窑窟竖竴笉簡糟绵缠罕罩翅翠翰耻肆肖肴膨舆舟舱艳艾芒芙芝芬苍苯茂"
        "茨菱葛蒂蓄蓉蓬蚀蜀蜜蜡衍衔衷袍裕裹誓讼诞谅谊谐谨贞贩贪赌赐趁蹈轩轿辐"
        "辰逊逝逢郧酬酷醇鈥鍙鍦鏄鏈钦钧钩铅铭铸锐镑阙陀陛隋隙雇雌霉霖霸顽颠饲"
        "饶饿鳍鳞鹏鼎"
    )
    for ch in batch:
        syls = g.pinyin(ch)
        assert len(syls) == 1 and not syls[0].startswith("char_"), (ch, syls)
    cases = [
        ("我肚子很饿", "饿", "e4"),               # vote-override chars
        ("母亲呵护着孩子", "呵", "he1"),
        ("古代士兵手持长戈作战", "戈", "ge1"),
        ("这座大厦有五十层", "厦", "sha4"),
        ("厦门是一座海滨城市", "厦", "xia4"),
        ("家里请了一位仆人", "仆", "pu2"),
        ("他的成绩很卓越", "卓", "zhuo2"),
        ("他在论坛上发了一个帖子", "帖", "tie3"),
        ("他买了一本字帖练书法", "帖", "tie4"),
        ("事情安排得很妥帖", "帖", "tie1"),
        ("公司支付了中介佣金", "佣", "yong4"),
        ("诸葛亮足智多谋", "葛", "ge3"),
        ("小猫的爪子很锋利", "爪", "zhua3"),
        ("他对禅宗文化很感兴趣", "禅", "chan2"),
        ("古代禅让制度的故事流传至今", "禅", "shan4"),
        ("他怔住了，半天说不出话", "怔", "zheng4"),
    ]
    for text, ch, want in cases:
        syls = g.pinyin(text)
        cjk = [c for c in text if "一" <= c <= "鿿"]
        assert len(syls) == len(cjk), (text, syls)
        got = syls[cjk.index(ch)]
        assert got == want, (text, ch, got, want)


def test_g2p_round3g_coverage_batch():
    """Round-3g: closes the jieba frequency-ranked top-3000 (348 chars;
    239 collation-group vote + 6 polyphone-voter overrides + 109
    hand-authored). Every char resolves; batch polyphones disambiguate."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    batch = (
        "乖乞亨仑仕伽佑侮倚傚傛兀冀凄凸凹剅剿勘募勫勿匀匪卞卤厄厢吁吼呐咋咒哇"
        "哗哟啸喧嗤嘻囚圭坎坪垒垜垮垱埔堕塌奢妓妾姥娟娥婢媚嫣宦寇寓寝寮寰尬尴"
        "屑岃岱嵋嵌嶅巫帆帜庐庵庶弊弘弧彝彦徙怡怯恍恕恳惶愉愣憾懒戟扒拂拘拚拢"
        "挫揪揽搁搅摧敞斌斐斧旷晌暇朽枉柬栋栗桓梭棕棱棵樊橡歪歹毙氮汰沐沛沦沧"
        "沽沾泣浏浴涅涡涯淀淑淘淫渝湁湪溯滥潇澄濂瀛瀹灏灿炕炬炳烯烹焰牡犁犬狄"
        "玲琐琦琳琼瑙瑰璧甩痴皖盏眷睹瞄瞅瞻硝碌祁祠禄禹禽禾秃窃窜窦笅笛篷簇粑"
        "粟粤粥粪粬粹糯綘繖绑绮缁缅缔缚缮缴羲翊翔耍耸耽耿肪胚胪胳胺腥膊膛膳舵"
        "舶芷苑荫莎莽菩萍蒲蔽蕃蕲蕴薯藩虏蠢衢衬衮裔裘裸褐襟觅詹諲讳讶诀诈诛诡"
        "诧诵谎谏谕谜谴豚購贮贿赠赣赦趟跋蹄蹇躬躯辜迦迭逛遏邢郝郢鄙酶釜鍏鍐鍑"
        "鍒鍚鎴鎵鏃鏉鐪钊钓钞钠钾铃锣锥锰镖闸闽阮陂陌陡隅隧雍鞍鞑鞘颂颖驿骇骚"
        "魁魄魅鲍鲟鹃麋黔"
    )
    for ch in batch:
        syls = g.pinyin(ch)
        assert len(syls) == 1 and not syls[0].startswith("char_"), (ch, syls)
    cases = [
        ("战士们在阵地上呐喊", "呐", "na4"),      # vote-override chars
        ("小偷怯生生地低下了头", "怯", "qie4"),
        ("他因盗窃被警方拘留", "窃", "qie4"),
        ("他的胳膊受伤了", "膊", "bo2"),
        ("政府呼吁大家节约用水", "吁", "yu4"),     # compounds
        ("他长吁了一口气", "吁", "xu1"),
        ("图书馆里禁止喧哗", "哗", "hua2"),
        ("雨哗啦啦地下个不停", "哗", "hua1"),
        ("车站上要提防扒手", "扒", "pa2"),
        ("他扒开草丛找到了钥匙", "扒", "ba1"),
        ("他每天练习瑜伽", "伽", "jia1"),
    ]
    for text, ch, want in cases:
        syls = g.pinyin(text)
        cjk = [c for c in text if "一" <= c <= "鿿"]
        assert len(syls) == len(cjk), (text, syls)
        got = syls[cjk.index(ch)]
        assert got == want, (text, ch, got, want)


def test_g2p_zhuyin_audit_fixes():
    """Zhuyin cross-collation audit (round 3g): group-coherence against
    Unicode::Collate::CJK::Zhuyin flagged two stale table defaults, fixed
    here — 粘 is the normative verb zhan1 (the adjective is 黏), bare 匙
    is chi2 (钥匙 keeps lexical shi5) — plus 咯's onomatopoeia registers."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    cases = [
        ("伤口粘在纱布上", "粘", "zhan1"),
        ("粘膜充血", "粘", "nian2"),
        ("这把汤匙是新的", "匙", "chi2"),
        ("他拿出钥匙开门", "匙", "shi5"),
        ("他在琢磨这个问题", "琢", "zuo2"),
        ("这件玉器经过精心雕琢", "琢", "zhuo2"),
        ("他心里咯噔一下", "咯", "ge1"),
    ]
    for text, ch, want in cases:
        syls = g.pinyin(text)
        cjk = [c for c in text if "一" <= c <= "鿿"]
        assert len(syls) == len(cjk), (text, syls)
        got = syls[cjk.index(ch)]
        assert got == want, (text, ch, got, want)


def test_g2p_derived_pos_lexicon():
    """The POS-derived statistical word lexicon (ROADMAP #11: the ttsfrd
    tagger's signal compiled offline from jieba word-POS data by
    tools/build_polyphone_lexicon.py) loads under authored WORD_PINYIN
    precedence and resolves the bare-polyphone tail the window rules
    could not see."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import (
        G2P, _derived_word_lexicon)
    from toolbox_for_asr_and_tts_tpu.tts.polyphones import WORD_PINYIN
    lex = _derived_word_lexicon()
    assert len(lex) >= 250, len(lex)
    # authored entries always win: no derived word may shadow WORD_PINYIN
    assert not set(lex) & set(WORD_PINYIN)
    g = G2P()
    cases = [
        ("他还手了", "还", "huan2"),             # verb word, not 还给
        ("你还没吃饭吗", "还", "hai2"),
        ("他弹奏了一首曲子", "弹", "tan2"),
        ("防弹衣挡住了子弹", "防弹衣", None),     # dan4 both positions
        ("他使出浑身解数", "解", "xie4"),
        ("名不见经传", "传", "zhuan4"),
        ("裁缝在缝补衣服", "缝", None),           # feng5 (tailor) vs feng2
        ("农民在地里种菜", "种", "zhong4"),
        ("少数服从多数", "数", "shu4"),
        ("他数了数零钱", "数", "shu3"),
    ]
    for text, ch, want in cases:
        syls = g.pinyin(text)
        cjk = [c for c in text if "一" <= c <= "鿿"]
        assert len(syls) == len(cjk), (text, syls)
        if want is not None and len(ch) == 1:
            got = syls[cjk.index(ch)]
            assert got == want, (text, ch, got, want)
    assert g.pinyin("防弹衣挡住了子弹")[1] == "dan4"
    assert g.pinyin("防弹衣挡住了子弹")[-1] == "dan4"
    assert g.pinyin("裁缝在缝补衣服")[1] == "feng5"
    assert g.pinyin("裁缝在缝补衣服")[3] == "feng2"


def test_g2p_round3h_blind_eval_closures():
    """Round-3h blind eval (docs/G2P.md): 39 scored held-out sentences over
    the round-3 machinery, 27/39 at first contact. Every miss is closed and
    locked here, plus non-regression probes for the contexts the new rules
    must NOT capture."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    cases = [
        # closures
        ("他一拳还了回去", "还", "huan2"),
        ("欠的人情总要还的", "还", "huan2"),
        ("这笔钱我下个月还你", "还", "huan2"),
        ("借的书他昨天还了", "还", "huan2"),
        ("他把钱还我了", "还", "huan2"),
        ("他数得很仔细", "数", "shu3"),
        ("院子里种着一棵枣树", "种", "zhong4"),
        ("墙缝里钻出一株小草", "缝", "feng4"),
        ("这首歌的曲比词好", "曲", "qu2"),       # qu3 + 3-3 sandhi before 比
        ("小偷扒窃时被抓住", "扒", "pa2"),
        ("他怔怔地望着窗外", "怔", "zheng4"),
        ("考古队拓印了碑文", "拓", "ta4"),
        # the locked-word guard: 还+了 must not fire across 了解/了结
        ("你还了解他吗", "还", "hai2"),
        # non-regression probes
        ("钱还不够用", "还", "hai2"),
        ("这笔账还没算清", "还", "hai2"),
        ("这种花很香", "种", "zhong3"),
        ("他缝了三针", "缝", "feng2"),
        ("山路弯曲难走", "曲", "qu1"),
        ("他还在弹琴", "还", "hai2"),
    ]
    for text, ch, want in cases:
        syls = g.pinyin(text)
        cjk = [c for c in text if "一" <= c <= "鿿"]
        assert len(syls) == len(cjk), (text, syls)
        got = syls[cjk.index(ch)]
        assert got == want, (text, ch, got, want)


def test_g2p_round3i_coverage_batch():
    """Round-3i: high-confidence slice of the jieba top-3500 tail (160
    chars whose single collation group is labeled by >=2 agreeing voters;
    4 review overrides 杠/犲/狸/驯)."""
    from toolbox_for_asr_and_tts_tpu.tts.text_frontend import G2P
    g = G2P()
    batch = (
        "丕乍佃佬佹侈侗侣俭倪倭偅傝傣兘兢冥劾勬匕匣吆吱呻咏咚咦嗕嗗圻坞垣垦堝"
        "変妒姝姹娌娴婿嫔嬪孜孢寞岀岄岔峙崛嶆庇彬彰徊後怠怦悍戎扳扼抒拣挟捎摹"
        "撼攘敕昧晖晦杞杠栅桨梍棠榆氣汛汹沅洼浼渤渭溉漕漳澜烩牒犲狡狩狸玫玺珂"
        "瑕睦睿矫碘祈祷祺秭笃篆紊绅绉绽缆缕羡耙肇胥胧腑舜芥芭苔茬荤莹萌蓦蚌蜿"
        "裴褂觑诲豌辫迄逍逾邑钛閲闺阜隘饵饷馒驯驹骞骸鸠鹧"
    )
    for ch in batch:
        syls = g.pinyin(ch)
        assert len(syls) == 1 and not syls[0].startswith("char_"), (ch, syls)
    cases = [
        ("狐狸的尾巴很蓬松", "狸", "li2"),
        ("这匹马被驯服了", "驯", "xun4"),
        ("他在单杠上做引体向上", "杠", "gang4"),
        ("医生看了看他的舌苔", "苔", "tai1"),
        ("岸边的青苔很滑", "苔", "tai2"),
        ("他用耙子搂了搂落叶", "耙", "pa2"),
    ]
    for text, ch, want in cases:
        syls = g.pinyin(text)
        cjk = [c for c in text if "一" <= c <= "鿿"]
        assert len(syls) == len(cjk), (text, syls)
        got = syls[cjk.index(ch)]
        assert got == want, (text, ch, got, want)
