"""Seed pinyin lexicon + phoneme inventory for the TTS text frontend.

This replaces the data component of the reference's native `ttsfrd` frontend
(survey §2.3) with an embedded seed lexicon covering common Mandarin
characters and the medical domain vocabulary the reference targets
(voice-service/app/services/hotwords.txt, full_hotwords.py). Deployments
extend it with a full lexicon file via `G2P.with_lexicon_file` — the phoneme
inventory below (standard initials/finals × tones) is complete, so only the
char→syllable mapping grows.
"""

# longest-first so prefix matching is unambiguous (zh before z, etc.)
INITIALS = [
    "zh", "ch", "sh", "b", "p", "m", "f", "d", "t", "n", "l",
    "g", "k", "h", "j", "q", "x", "r", "z", "c", "s", "y", "w",
]

FINALS = [
    "a", "o", "e", "i", "u", "v", "ai", "ei", "ao", "ou", "an", "en",
    "ang", "eng", "ong", "er", "ia", "ie", "iao", "iu", "iou", "ian",
    "in", "iang", "ing", "iong", "ua", "uo", "uai", "ui", "uei", "uan",
    "un", "uen", "uang", "ueng", "ve", "van", "vn", "iao", "ua",
]

SPECIALS = ["#sil", "#br", "#sp"]


def all_symbols():
    syms = list(SPECIALS)
    syms += list(INITIALS)
    seen = set()
    for f in FINALS:
        for tone in range(1, 6):
            for s in (f"{f}{tone}", f"{f}r{tone}"):  # plain + erhua rhotic
                if s not in seen:
                    seen.add(s)
                    syms.append(s)
    syms += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    syms += [str(d) for d in range(10)]
    syms += [f"char_{i}" for i in range(4096)]
    return syms


# char → pinyin (tone-numbered). Seed vocabulary: high-frequency characters
# plus the reference's medical/voice-assistant domain.
PINYIN_TABLE = {
    # pronouns / function words
    "我": "wo3", "你": "ni3", "您": "nin2", "他": "ta1", "她": "ta1",
    "它": "ta1", "们": "men5", "的": "de5", "了": "le5", "是": "shi4",
    "在": "zai4", "有": "you3", "和": "he2", "与": "yu3", "或": "huo4",
    "不": "bu4", "没": "mei2", "很": "hen3", "都": "dou1", "也": "ye3",
    "就": "jiu4", "要": "yao4", "会": "hui4", "能": "neng2", "可": "ke3",
    "以": "yi3", "这": "zhe4", "那": "na4", "什": "shen2", "么": "me5",
    "吗": "ma5", "呢": "ne5", "吧": "ba5", "啊": "a5", "哦": "o5",
    "哪": "na3", "儿": "er2", "谁": "shei2", "自": "zi4", "己": "ji3",
    "嗯": "en1", "请": "qing3", "到": "dao4", "去": "qu4", "来": "lai2",
    "上": "shang4", "下": "xia4", "前": "qian2", "后": "hou4",
    "左": "zuo3", "右": "you4", "里": "li3", "外": "wai4", "中": "zhong1",
    "大": "da4", "小": "xiao3", "多": "duo1", "少": "shao3",
    "高": "gao1", "低": "di1", "长": "chang2", "短": "duan3",
    "好": "hao3", "坏": "huai4", "新": "xin1", "老": "lao3",
    "人": "ren2", "生": "sheng1", "活": "huo2", "工": "gong1",
    "作": "zuo4", "学": "xue2", "习": "xi2", "时": "shi2", "间": "jian1",
    "年": "nian2", "月": "yue4", "日": "ri4", "天": "tian1",
    "今": "jin1", "明": "ming2", "昨": "zuo2", "现": "xian4",
    "早": "zao3", "晚": "wan3", "点": "dian3", "分": "fen1", "秒": "miao3",
    "气": "qi4", "怎": "zen3", "样": "yang4", "为": "wei4",
    "因": "yin1", "所": "suo3", "但": "dan4", "而": "er2", "如": "ru2",
    "果": "guo3", "还": "hai2", "再": "zai4", "又": "you4", "只": "zhi3",
    "个": "ge4", "些": "xie1", "每": "mei3", "让": "rang4",
    # numbers
    "零": "ling2", "一": "yi1", "二": "er4", "三": "san1", "四": "si4",
    "五": "wu3", "六": "liu4", "七": "qi1", "八": "ba1", "九": "jiu3",
    "十": "shi2", "百": "bai3", "千": "qian1", "万": "wan4", "亿": "yi4",
    "第": "di4", "两": "liang3", "半": "ban4", "次": "ci4", "号": "hao4",
    # voice assistant / wake word domain
    "护": "hu4", "士": "shi4", "医": "yi1", "生": "sheng1",
    "说": "shuo1", "话": "hua4", "听": "ting1", "讲": "jiang3",
    "声": "sheng1", "音": "yin1", "语": "yu3", "言": "yan2",
    "识": "shi2", "别": "bie2", "唤": "huan4", "醒": "xing3",
    "开": "kai1", "始": "shi3", "结": "jie2", "束": "shu4",
    "停": "ting2", "止": "zhi3", "取": "qu3", "消": "xiao1",
    "确": "que4", "认": "ren4", "成": "cheng2", "功": "gong1",
    "失": "shi1", "败": "bai4", "错": "cuo4", "误": "wu4",
    "退": "tui4", "出": "chu1", "谢": "xie4", "对": "dui4",
    "起": "qi3", "欢": "huan1", "迎": "ying2", "使": "shi3", "用": "yong4",
    "系": "xi4", "统": "tong3", "服": "fu2", "务": "wu4",
    "帮": "bang1", "助": "zhu4", "问": "wen4", "题": "ti2",
    "回": "hui2", "答": "da2", "需": "xu1", "内": "nei4", "容": "rong2",
    # medical domain (reference hotwords / diagnosis texts)
    "病": "bing4", "症": "zheng4", "状": "zhuang4", "诊": "zhen3",
    "断": "duan4", "治": "zhi4", "疗": "liao2", "药": "yao4",
    "检": "jian3", "查": "cha2", "化": "hua4", "验": "yan4",
    "血": "xue4", "压": "ya1", "糖": "tang2", "尿": "niao4",
    "心": "xin1", "脏": "zang4", "肝": "gan1", "肺": "fei4",
    "肾": "shen4", "胃": "wei4", "肠": "chang2", "脑": "nao3",
    "头": "tou2", "痛": "tong4", "疼": "teng2", "晕": "yun1",
    "热": "re4", "烧": "shao1", "咳": "ke2", "嗽": "sou4",
    "喘": "chuan3", "闷": "men4", "慌": "huang1", "乏": "fa2",
    "力": "li4", "酸": "suan1", "麻": "ma2", "肿": "zhong3",
    "胀": "zhang4", "呕": "ou3", "吐": "tu4", "泻": "xie4",
    "便": "bian4", "秘": "mi4", "食": "shi2", "欲": "yu4",
    "睡": "shui4", "眠": "mian2", "失": "shi1", "律": "lv4",
    "率": "lv4", "慢": "man4", "快": "kuai4", "跳": "tiao4",
    "衰": "shuai1", "竭": "jie2", "炎": "yan2", "感": "gan3",
    "染": "ran3", "冒": "mao4", "发": "fa1", "烦": "fan2",
    "躁": "zao4", "焦": "jiao1", "虑": "lv4", "抑": "yi4", "郁": "yu4",
    "骨": "gu3", "折": "zhe2", "伤": "shang1", "口": "kou3",
    "手": "shou3", "术": "shu4", "住": "zhu4", "院": "yuan4",
    "门": "men2", "急": "ji2", "救": "jiu4", "输": "shu1", "液": "ye4",
    "打": "da3", "针": "zhen1", "片": "pian4", "胶": "jiao1",
    "囊": "nang2", "服": "fu2", "餐": "can1", "饭": "fan4",
    "水": "shui3", "休": "xiu1", "息": "xi1", "复": "fu4",
    "指": "zhi3", "标": "biao1", "正": "zheng4", "常": "chang2",
    "异": "yi4", "偏": "pian1", "注": "zhu4", "意": "yi4",
    "建": "jian4", "议": "yi4", "避": "bi4", "免": "mian3",
    "控": "kong4", "制": "zhi4", "定": "ding4", "期": "qi1",
    "持": "chi2", "续": "xu4", "观": "guan1", "察": "cha2",
    "记": "ji4", "录": "lu4", "报": "bao4", "告": "gao4",
    "患": "huan4", "者": "zhe3", "体": "ti3", "温": "wen1",
    "脉": "mai4", "搏": "bo2", "呼": "hu1", "吸": "xi1",
    "皮": "pi2", "肤": "fu1", "眼": "yan3", "耳": "er3",
    "鼻": "bi2", "喉": "hou2", "咽": "yan1", "牙": "ya2",
    "背": "bei4", "腰": "yao1", "腿": "tui3", "脚": "jiao3",
    "臂": "bi4", "胸": "xiong1", "腹": "fu4", "肚": "du4",
    "子": "zi3", "部": "bu4", "位": "wei4", "度": "du4",
    "级": "ji2", "轻": "qing1", "重": "zhong4", "严": "yan2",
    "缓": "huan3", "解": "jie3", "加": "jia1", "减": "jian3",
    "增": "zeng1", "降": "jiang4", "升": "sheng1", "史": "shi3",
    "过": "guo4", "敏": "min3", "遗": "yi2", "传": "chuan2",
    "家": "jia1", "族": "zu2", "吃": "chi1", "喝": "he1",
    "抽": "chou1", "烟": "yan1", "酒": "jiu3", "运": "yun4",
    "动": "dong4", "锻": "duan4", "炼": "lian4", "盐": "yan2",
    "油": "you2", "脂": "zhi1", "肥": "fei2", "胖": "pang4",
    "瘦": "shou4", "岁": "sui4", "男": "nan2", "女": "nv3",
    "性": "xing4", "名": "ming2", "字": "zi4", "电": "dian4",
    "机": "ji1", "器": "qi4", "科": "ke1", "室": "shi4",
    "床": "chuang2", "单": "dan1", "据": "ju4", "结": "jie2",
    "论": "lun4", "情": "qing2", "况": "kuang4", "严": "yan2",
    "测": "ce4", "量": "liang4", "数": "shu4", "值": "zhi2",
    "告": "gao4", "诉": "su4", "知": "zhi1", "道": "dao4",
    "想": "xiang3", "觉": "jue2", "得": "de2", "看": "kan4",
    "见": "jian4", "走": "zou3", "站": "zhan4", "坐": "zuo4",
    "躺": "tang3", "穿": "chuan1", "衣": "yi1", "洗": "xi3",
    "澡": "zao3", "刷": "shua1", "最": "zui4", "近": "jin4",
    "远": "yuan3", "经": "jing1", "已": "yi3", "曾": "ceng2",
    "平": "ping2", "稳": "wen3", "安": "an1", "全": "quan2",
    "危": "wei1", "险": "xian3", "紧": "jin3", "张": "zhang1",
    "放": "fang4", "松": "song1", "关": "guan1", "环": "huan2",
    "境": "jing4", "保": "bao3", "健": "jian4", "康": "kang1",
    "恢": "hui1", "预": "yu4", "防": "fang2", "随": "sui2",
    "访": "fang3", "联": "lian2", "电": "dian4", "话": "hua4",
}
