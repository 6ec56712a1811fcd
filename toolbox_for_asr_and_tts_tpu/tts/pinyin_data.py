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


def all_sy_symbols():
    """Toneless phone inventory — the `sy` stream of the KAN-TTS 4-stream
    linguistic unit (sy/tone/syllable_flag/word_segment); tone lives in its
    own stream, so finals appear once (plus the erhua rhotic variant)."""
    syms = list(SPECIALS) + list(INITIALS)
    seen = set(syms)
    for f in FINALS:
        for s in (f, f + "r"):
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

# round-2c coverage expansion: the next ~450 highest-frequency characters
# (grammar words, everyday verbs/nouns/adjectives, more medical terms), so
# ordinary open-domain sentences no longer drop characters to char_<cp>
# fallbacks. Polyphonic characters carry their MOST FREQUENT reading here;
# the word lexicon (tts/polyphones.py) and the contextual particle rules in
# text_frontend.py override them in context.
PINYIN_TABLE.update({
    # grammar / function words
    "把": "ba3", "被": "bei4", "从": "cong2", "向": "xiang4",
    "往": "wang3", "给": "gei3", "比": "bi3", "跟": "gen1", "于": "yu2",
    "之": "zhi1", "其": "qi2", "此": "ci3", "该": "gai1", "另": "ling4",
    "某": "mou3", "任": "ren4", "何": "he2", "若": "ruo4", "则": "ze2",
    "即": "ji2", "既": "ji4", "虽": "sui1", "然": "ran2", "且": "qie3",
    "并": "bing4", "非": "fei1", "无": "wu2", "未": "wei4", "莫": "mo4",
    "仍": "reng2", "尚": "shang4", "刚": "gang1", "才": "cai2",
    "总": "zong3", "偶": "ou3", "尔": "er3", "越": "yue4", "更": "geng4",
    "极": "ji2", "太": "tai4", "挺": "ting3", "稍": "shao1",
    "略": "lve4", "几": "ji3", "许": "xu3", "约": "yue1", "差": "cha4",
    "乎": "hu1", "嘛": "ma5", "呀": "ya5", "哈": "ha1", "喂": "wei2",
    "唉": "ai1", "哎": "ai1", "噢": "o1", "喔": "o1", "啥": "sha2",
    "咱": "zan2", "地": "di4", "着": "zhe5",
    # everyday verbs
    "做": "zuo4", "跑": "pao3", "受": "shou4", "抓": "zhua1",
    "拿": "na2", "找": "zhao3", "丢": "diu1", "扔": "reng1",
    "搬": "ban1", "抬": "tai2", "推": "tui1", "拉": "la1", "提": "ti2",
    "带": "dai4", "送": "song4", "接": "jie1", "借": "jie4",
    "买": "mai3", "卖": "mai4", "付": "fu4", "花": "hua1", "费": "fei4",
    "挣": "zheng4", "赚": "zhuan4", "存": "cun2", "换": "huan4",
    "修": "xiu1", "造": "zao4", "盖": "gai4", "拆": "chai1",
    "装": "zhuang1", "卸": "xie4", "搞": "gao3", "弄": "nong4",
    "办": "ban4", "管": "guan3", "派": "pai4", "叫": "jiao4",
    "喊": "han3", "骂": "ma4", "哭": "ku1", "笑": "xiao4",
    "闹": "nao4", "吵": "chao3", "玩": "wan2", "唱": "chang4",
    "歌": "ge1", "舞": "wu3", "画": "hua4", "写": "xie3", "读": "du2",
    "念": "nian4", "抄": "chao1", "改": "gai3", "擦": "ca1",
    "排": "pai2", "队": "dui4", "等": "deng3", "候": "hou4",
    "待": "dai4", "留": "liu2", "剩": "sheng4", "忘": "wang4",
    "懂": "dong3", "猜": "cai1", "选": "xuan3", "挑": "tiao1",
    "决": "jue2", "判": "pan4", "争": "zheng1", "赢": "ying2",
    "胜": "sheng4", "负": "fu4", "攻": "gong1", "守": "shou3",
    "逃": "tao2", "追": "zhui1", "赶": "gan3", "躲": "duo3",
    "藏": "cang2", "扶": "fu2", "抱": "bao4", "摸": "mo1",
    "碰": "peng4", "撞": "zhuang4", "摔": "shuai1", "跌": "die1",
    "爬": "pa2", "游": "you2", "泳": "yong3", "飞": "fei1",
    "落": "luo4", "沉": "chen2", "浮": "fu2", "漂": "piao1",
    "流": "liu2", "滴": "di1", "倒": "dao3", "灌": "guan4",
    "浇": "jiao1", "泡": "pao4", "煮": "zhu3", "蒸": "zheng1",
    "炒": "chao3", "烤": "kao3", "煎": "jian1", "切": "qie1",
    "砍": "kan3", "缝": "feng2", "补": "bu3", "织": "zhi1",
    "按": "an4", "揉": "rou2", "捏": "nie1", "敲": "qiao1",
    "扫": "sao3", "拖": "tuo1",
    "挂": "gua4", "铺": "pu1", "叠": "die2", "卷": "juan3",
    "摆": "bai3", "移": "yi2", "搭": "da1", "拼": "pin1",
    "乘": "cheng2", "除": "chu2", "教": "jiao4", "练": "lian4",
    "考": "kao3", "试": "shi4", "毕": "bi4", "业": "ye4",
    "醉": "zui4", "剖": "pou1", "愈": "yu4", "养": "yang3",
    "抢": "qiang3", "挤": "ji3",
    # nature / food
    "土": "tu3", "场": "chang3", "山": "shan1", "河": "he2",
    "湖": "hu2", "海": "hai3", "江": "jiang1", "岛": "dao3",
    "岸": "an4", "沙": "sha1", "石": "shi2", "泥": "ni2",
    "草": "cao3", "树": "shu4", "林": "lin2", "森": "sen1",
    "叶": "ye4", "根": "gen1", "枝": "zhi1", "种": "zhong3",
    "米": "mi3", "麦": "mai4", "豆": "dou4", "菜": "cai4",
    "肉": "rou4", "鱼": "yu2", "蛋": "dan4", "茶": "cha2",
    "汤": "tang1", "面": "mian4", "包": "bao1", "饼": "bing3",
    "糕": "gao1", "甜": "tian2", "苦": "ku3", "辣": "la4",
    "咸": "xian2", "淡": "dan4", "香": "xiang1", "臭": "chou4",
    "味": "wei4", "闻": "wen2", "球": "qiu2", "壳": "ke2",
    # weather / color
    "风": "feng1", "雨": "yu3", "雪": "xue3", "云": "yun2",
    "雷": "lei2", "闪": "shan3", "冰": "bing1", "霜": "shuang1",
    "雾": "wu4", "晴": "qing2", "阴": "yin1", "阳": "yang2",
    "光": "guang1", "影": "ying3", "色": "se4", "红": "hong2",
    "黄": "huang2", "蓝": "lan2", "绿": "lv4", "青": "qing1",
    "黑": "hei1", "白": "bai2", "灰": "hui1", "紫": "zi3",
    "粉": "fen3", "颜": "yan2",
    # family / people
    "父": "fu4", "母": "mu3", "爸": "ba4", "妈": "ma1", "哥": "ge1",
    "弟": "di4", "姐": "jie3", "妹": "mei4", "爷": "ye2",
    "奶": "nai3", "叔": "shu1", "姨": "yi2", "舅": "jiu4",
    "婆": "po2", "孙": "sun1", "夫": "fu1", "妻": "qi1",
    "婚": "hun1", "嫁": "jia4", "娶": "qu3", "孕": "yun4",
    "产": "chan3", "婴": "ying1", "孩": "hai2", "童": "tong2",
    "幼": "you4", "壮": "zhuang4",
    # places / institutions
    "国": "guo2", "省": "sheng3", "市": "shi4", "县": "xian4",
    "区": "qu1", "镇": "zhen4", "乡": "xiang1", "村": "cun1",
    "城": "cheng2", "街": "jie1", "路": "lu4", "桥": "qiao2",
    "楼": "lou2", "层": "ceng2", "房": "fang2", "屋": "wu1",
    "厅": "ting1", "厨": "chu2", "厕": "ce4", "梯": "ti1",
    "窗": "chuang1", "墙": "qiang2", "顶": "ding3", "底": "di3",
    "角": "jiao3", "边": "bian1", "旁": "pang2", "邻": "lin2",
    "校": "xiao4", "园": "yuan2", "店": "dian4", "厂": "chang3",
    "司": "si1", "银": "yin2", "邮": "you2", "局": "ju2",
    "馆": "guan3", "库": "ku4", "仓": "cang1", "行": "xing2",
    # transport
    "车": "che1", "船": "chuan2", "票": "piao4", "铁": "tie3",
    "轨": "gui3", "航": "hang2", "港": "gang3", "驶": "shi3",
    "驾": "jia4", "骑": "qi2", "载": "zai4", "轮": "lun2",
    "胎": "tai1",
    # objects / clothing
    "桌": "zhuo1", "椅": "yi3", "柜": "gui4", "箱": "xiang1",
    "袋": "dai4", "盒": "he2", "瓶": "ping2", "杯": "bei1",
    "碗": "wan3", "盘": "pan2", "筷": "kuai4", "勺": "shao2",
    "刀": "dao1", "叉": "cha1", "锅": "guo1", "炉": "lu2",
    "灯": "deng1", "伞": "san3", "镜": "jing4", "梳": "shu1",
    "巾": "jin1", "枕": "zhen3", "垫": "dian4", "毯": "tan3",
    "帘": "lian2", "绳": "sheng2", "线": "xian4", "剪": "jian3",
    "锁": "suo3", "钥": "yao4", "匙": "shi5", "钟": "zhong1",
    "表": "biao3", "戒": "jie4", "裤": "ku4", "裙": "qun2",
    "袜": "wa4", "鞋": "xie2", "帽": "mao4", "领": "ling3",
    "袖": "xiu4", "扣": "kou4", "夹": "jia1",
    # abstract nouns
    "事": "shi4", "物": "wu4", "品": "pin3", "类": "lei4",
    "型": "xing2", "式": "shi4", "法": "fa3", "规": "gui1",
    "条": "tiao2", "款": "kuan3", "项": "xiang4", "目": "mu4",
    "例": "li4", "案": "an4", "件": "jian4", "份": "fen4",
    "页": "ye4", "篇": "pian1", "章": "zhang1", "节": "jie2",
    "课": "ke4", "班": "ban1", "组": "zu3", "团": "tuan2",
    "伙": "huo3", "伴": "ban4", "友": "you3", "朋": "peng2",
    "客": "ke4", "主": "zhu3",
    # mind / emotion
    "思": "si1", "忆": "yi4", "梦": "meng4", "信": "xin4",
    "疑": "yi2", "盼": "pan4", "望": "wang4", "希": "xi1",
    "愿": "yuan4", "求": "qiu2", "怕": "pa4", "恐": "kong3",
    "惧": "ju4", "惊": "jing1", "吓": "xia4", "怒": "nu4",
    "恨": "hen4", "爱": "ai4", "喜": "xi3", "悲": "bei1",
    "哀": "ai1", "愁": "chou2", "忧": "you1",
    # speech acts
    "谈": "tan2", "聊": "liao2", "评": "ping2", "赞": "zan4",
    "夸": "kua1", "批": "pi1", "责": "ze2", "怪": "guai4",
    "劝": "quan4", "命": "ming4", "令": "ling4", "禁": "jin4",
    "允": "yun3",
    # measures / time
    "斤": "jin1", "克": "ke4", "吨": "dun1", "毫": "hao2",
    "厘": "li2", "寸": "cun4", "尺": "chi3", "倍": "bei4",
    "亩": "mu3", "春": "chun1", "夏": "xia4", "秋": "qiu1",
    "冬": "dong1", "季": "ji4", "周": "zhou1", "星": "xing1",
    "世": "shi4", "纪": "ji4", "代": "dai4", "古": "gu3",
    "旧": "jiu4", "久": "jiu3", "永": "yong3", "暂": "zan4",
    "忽": "hu1", "渐": "jian4", "终": "zhong1", "初": "chu1",
    "末": "mo4", "夜": "ye4", "午": "wu3", "晨": "chen2",
    # tech
    "网": "wang3", "码": "ma3", "键": "jian4", "屏": "ping2",
    "幕": "mu4", "软": "ruan3", "硬": "ying4", "芯": "xin1",
    "智": "zhi4", "慧": "hui4", "算": "suan4", "储": "chu3",
    # more medical
    "癌": "ai2", "瘤": "liu2", "疮": "chuang1", "疹": "zhen3",
    "疫": "yi4", "苗": "miao2", "剂": "ji4", "钙": "gai4",
    "锌": "xin1", "维": "wei2", "素": "su4", "菌": "jun1",
    "毒": "du2", "疱": "pao4", "溃": "kui4", "疡": "yang2",
    "栓": "shuan1", "塞": "sai1", "梗": "geng3", "死": "si3",
    "亡": "wang2", "胞": "bao1", "核": "he2", "膜": "mo2",
    "腺": "xian4", "官": "guan1", "脾": "pi2", "胆": "dan3",
    "胰": "yi2", "膀": "pang2", "胱": "guang1", "宫": "gong1",
    "卵": "luan3", "精": "jing1", "汗": "han4", "泪": "lei4",
    "涕": "ti4", "痰": "tan2", "脓": "nong2", "疤": "ba1",
    "痕": "hen2", "纹": "wen2", "斑": "ban1", "痣": "zhi4",
    # adjectives
    "美": "mei3", "丑": "chou3", "矮": "ai3", "粗": "cu1",
    "细": "xi4", "厚": "hou4", "薄": "bao2", "宽": "kuan1",
    "窄": "zhai3", "深": "shen1", "浅": "qian3", "干": "gan1",
    "湿": "shi1", "脆": "cui4", "嫩": "nen4", "牢": "lao2",
    "固": "gu4", "滑": "hua2", "粘": "nian2", "净": "jing4",
    "乱": "luan4", "齐": "qi2", "整": "zheng3", "碎": "sui4",
    "破": "po4", "烂": "lan4", "真": "zhen1", "假": "jia3",
    "空": "kong1", "满": "man3", "缺": "que1", "穷": "qiong2",
    "富": "fu4", "贵": "gui4", "贱": "jian4", "宜": "yi2",
    # basics the first pass missed
    "公": "gong1", "散": "san4", "步": "bu4", "视": "shi4",
    "火": "huo3", "马": "ma3", "笔": "bi3", "纸": "zhi3",
    "书": "shu1", "本": "ben3", "册": "ce4", "卡": "ka3",
    "台": "tai2", "播": "bo1", "频": "pin2", "旗": "qi2",
    "军": "jun1", "兵": "bing1", "战": "zhan4", "爆": "bao4",
    "燃": "ran2", "灭": "mie4", "金": "jin1", "银": "yin2",
    "铜": "tong2", "铝": "lv3", "钢": "gang1", "玉": "yu4",
    "珠": "zhu1", "宝": "bao3", "钱": "qian2", "币": "bi4",
    "价": "jia4", "账": "zhang4", "税": "shui4", "租": "zu1",
    "利": "li4", "益": "yi4", "损": "sun3", "赔": "pei2",
    "偿": "chang2", "欠": "qian4", "债": "zhai4",
    # animals
    "狗": "gou3", "猫": "mao1", "鸟": "niao3", "虫": "chong2",
    "牛": "niu2", "羊": "yang2", "猪": "zhu1", "鸡": "ji1",
    "鸭": "ya1", "鹅": "e2", "兔": "tu4", "鼠": "shu3",
    "虎": "hu3", "狼": "lang2", "熊": "xiong2", "猴": "hou2",
    "象": "xiang4", "鹿": "lu4", "蛇": "she2", "龟": "gui1",
    "蛙": "wa1", "龙": "long2", "凤": "feng4", "蚊": "wen2",
    "蝇": "ying2", "蜂": "feng1", "蚁": "yi3", "蜘": "zhi1",
    "蛛": "zhu1",
    # common surnames (patient names in the medical domain)
    "王": "wang2", "李": "li3", "刘": "liu2", "陈": "chen2",
    "杨": "yang2", "赵": "zhao4", "吴": "wu2", "徐": "xu2",
    "朱": "zhu1", "郭": "guo1", "罗": "luo2", "梁": "liang2",
    "宋": "song4", "郑": "zheng4", "韩": "han2", "唐": "tang2",
    "冯": "feng2", "董": "dong3", "萧": "xiao1", "程": "cheng2",
    "曹": "cao2", "袁": "yuan2", "邓": "deng4", "傅": "fu4",
    "沈": "shen3", "彭": "peng2", "吕": "lv3", "苏": "su1",
    "卢": "lu2", "蒋": "jiang3", "蔡": "cai4", "贾": "jia3",
    "丁": "ding1", "魏": "wei4", "薛": "xue1", "阎": "yan2",
    "余": "yu2", "潘": "pan1", "杜": "du4", "戴": "dai4",
    "汪": "wang1", "田": "tian2", "姜": "jiang1", "范": "fan4",
    "方": "fang1", "姚": "yao2", "谭": "tan2", "廖": "liao4",
    "邹": "zou1", "陆": "lu4", "孔": "kong3", "崔": "cui1",
    "毛": "mao2", "邱": "qiu1", "秦": "qin2", "顾": "gu4",
    "侯": "hou2", "邵": "shao4", "孟": "meng4", "段": "duan4",
    "尹": "yin3", "黎": "li2", "易": "yi4", "武": "wu3",
    "乔": "qiao2", "贺": "he4", "赖": "lai4", "文": "wen2",
    "施": "shi1", "洪": "hong2", "翁": "weng1", "莫": "mo4",
    # round-2c batch 3: gaps found by open-domain probing
    "举": "ju3", "优": "you1", "充": "chong1", "准": "zhun3",
    "划": "hua4", "历": "li4", "参": "can1", "变": "bian4",
    "各": "ge4", "同": "tong2", "图": "tu2", "基": "ji1",
    "备": "bei4", "将": "jiang1", "属": "shu3", "师": "shi1",
    "强": "qiang2", "当": "dang1", "恶": "e4", "户": "hu4",
    "拍": "pai1", "显": "xian3", "暖": "nuan3", "清": "qing1",
    "渗": "shen4", "照": "zhao4", "特": "te4", "秀": "xiu4",
    "立": "li4", "继": "ji4", "育": "yu4", "腻": "ni4",
    "良": "liang2", "苹": "ping2", "营": "ying2", "蔬": "shu1",
    "蕉": "jiao1", "计": "ji4", "设": "she4", "证": "zheng4",
    "质": "zhi4", "超": "chao1", "足": "zu2", "身": "shen1",
    "较": "jiao4", "达": "da2", "进": "jin4", "连": "lian2",
    "适": "shi4", "陪": "pei2", "静": "jing4", "饮": "yin3",
    "鲜": "xian1", "核": "he2", "末": "mo4", "料": "liao4",
    "务": "wu4", "细": "xi4", "组": "zu3", "织": "zhi1",
    "程": "cheng2", "功": "gong1", "效": "xiao4", "产": "chan3",
    "品": "pin3", "格": "ge2", "价": "jia4", "销": "xiao1",
    "售": "shou4", "购": "gou4", "货": "huo4", "商": "shang1",
    "贸": "mao4", "供": "gong1", "求": "qiu2", "需": "xu1",
    "责": "ze2", "权": "quan2", "义": "yi4", "利": "li4",
    "益": "yi4", "损": "sun3", "失": "shi1", "败": "bai4",
    "胜": "sheng4", "负": "fu4", "输": "shu1", "赢": "ying2",
    "竞": "jing4", "赛": "sai4", "比": "bi3", "较": "jiao4",
    "评": "ping2", "审": "shen3", "批": "pi1", "核": "he2",
    "查": "cha2", "验": "yan4", "测": "ce4", "试": "shi4",
    "练": "lian4", "训": "xun4", "演": "yan3", "示": "shi4",
    "展": "zhan3", "览": "lan3", "观": "guan1", "察": "cha2",
    "研": "yan2", "究": "jiu1", "探": "tan4", "索": "suo3",
    "析": "xi1", "解": "jie3", "释": "shi4", "阐": "chan3",
    "述": "shu4", "叙": "xu4", "描": "miao2", "绘": "hui4",
    "写": "xie3", "译": "yi4", "编": "bian1", "辑": "ji2",
    "版": "ban3", "印": "yin4", "刷": "shua1", "刊": "kan1",
    "登": "deng1", "载": "zai4", "发": "fa1", "布": "bu4",
    "宣": "xuan1", "告": "gao4", "通": "tong1", "报": "bao4",
    "讯": "xun4", "息": "xi1", "闻": "wen2", "媒": "mei2",
    "届": "jie4", "段": "duan4", "批": "pi1", "群": "qun2",
    "众": "zhong4", "民": "min2", "官": "guan1", "政": "zheng4",
    "府": "fu3", "党": "dang3", "派": "pai4", "团": "tuan2",
    "社": "she4", "协": "xie2", "委": "wei3", "员": "yuan2",
    "原": "yuan2", "居": "ju1", "座": "zuo4", "疾": "ji2",
    "详": "xiang2", "辛": "xin1", "均": "jun1", "衡": "heng2",
})

# Round-2d: standalone defaults for characters previously known only inside
# polyphone compounds (they fell to char_<cp> unknowns when used alone).
# For polyphonic entries the STANDALONE-most reading is chosen; compound
# readings stay governed by tts/polyphones.py WORD_PINYIN (words win).
PINYIN_TABLE.update({
    "丧": "sang4", "乌": "wu1", "乐": "le4", "予": "yu3", "互": "hu4",
    "亮": "liang4", "亲": "qin1", "仿": "fang3", "伏": "fu2", "似": "si4",
    "佛": "fo2", "佝": "gou1", "倔": "jue2", "偻": "lou2", "兴": "xing4",
    "冠": "guan1", "凉": "liang2", "击": "ji1", "创": "chuang4",
    "削": "xiao1", "剥": "bo1", "劳": "lao2", "勉": "mian3", "卒": "zu2",
    "卜": "bu3", "占": "zhan4", "厌": "yan4", "反": "fan3", "合": "he2",
    "吞": "tun1", "咀": "ju3", "哄": "hong3", "哽": "geng3", "喷": "pen1",
    "嚏": "ti4", "嚼": "jiao2", "困": "kun4", "圆": "yuan2", "圈": "quan1",
    "址": "zhi3", "坊": "fang1", "埋": "mai2", "处": "chu4", "奇": "qi2",
    "奉": "feng4", "奋": "fen4", "奖": "jiang3", "宁": "ning2",
    "实": "shi2", "宿": "su4", "密": "mi4", "尽": "jin4", "帚": "zhou3",
    "应": "ying1", "延": "yan2", "弯": "wan1", "弱": "ruo4", "弹": "dan4",
    "归": "gui1", "彩": "cai3", "忌": "ji4", "怨": "yuan4", "悄": "qiao1",
    "扎": "zha1", "执": "zhi2", "扩": "kuo4", "投": "tou2", "抹": "mo3",
    "撒": "sa3", "旺": "wang4", "暑": "shu3", "暴": "bao4", "曲": "qu1",
    "朝": "chao2", "板": "ban3", "植": "zhi2", "概": "gai4", "模": "mo2",
    "横": "heng2", "沮": "ju3", "泊": "bo2", "浆": "jiang1", "涂": "tu2",
    "涨": "zhang3", "灾": "zai1", "燥": "zao4", "理": "li3", "疟": "nve4",
    "盛": "sheng4", "相": "xiang1", "矢": "shi3", "磨": "mo2",
    "积": "ji1", "稠": "chou2", "累": "lei4", "翘": "qiao4",
    "腾": "teng2", "舍": "she4", "茄": "qie2", "荨": "xun2",
    "获": "huo4", "蛮": "man2", "袄": "ao3", "裂": "lie4", "西": "xi1",
    "调": "diao4", "贫": "pin2", "贴": "tie1", "趣": "qu4", "轧": "ya4",
    "转": "zhuan3", "迫": "po4", "闲": "xian2", "附": "fu4",
    "隐": "yin3", "难": "nan2", "露": "lu4", "首": "shou3", "骗": "pian4",
})

# Round-3c blind-extension closures (docs/G2P.md): 11 common chars had NO
# table entry at all (char_<cp> fallback) — the third blind set surfaced a
# coverage class below disambiguation. Standalone-most readings; alternate
# readings live in WORD_PINYIN round-3c compounds.
PINYIN_TABLE.update({
    "钻": "zuan1", "巷": "xiang4", "刹": "sha1", "杆": "gan1",
    "挨": "ai1", "奔": "ben1", "拧": "ning2", "伺": "si4",
    "晃": "huang4", "逮": "dai3", "撇": "pie1",
})

# Round-2d sweep: every CJK character appearing in the repo's own assets
# (hotwords.txt, SYMS list, demo/test texts) must synthesize without a
# char_<cp> fallback — these were found missing by scanning those sources.
PINYIN_TABLE.update({
    "丙": "bing3", "东": "dong1", "串": "chuan4", "乙": "yi3", "乳": "ru3",
    "仅": "jin3", "促": "cu4", "傍": "bang4", "僵": "jiang1", "元": "yuan2",
    "先": "xian1", "入": "ru4", "冷": "leng3", "凌": "ling2", "凶": "xiong1",
    "删": "shan1", "刺": "ci4", "刻": "ke4", "劲": "jin4", "势": "shi4",
    "厉": "li4", "厥": "jue2", "及": "ji2", "句": "ju4", "吾": "wu2",
    "呃": "e4", "呜": "wu1", "呦": "you1", "咯": "ka3", "哑": "ya3",
    "哼": "heng1", "善": "shan4", "嗅": "xiu4", "嗜": "shi4", "嗳": "ai3",
    "嗷": "ao2", "嘶": "si1", "噗": "pu1", "块": "kuai4", "坠": "zhui4",
    "够": "gou4", "害": "hai4", "寒": "han2", "射": "she4", "川": "chuan1",
    "巴": "ba1", "帕": "pa4", "幺": "yao1", "废": "fei4", "必": "bi4",
    "态": "tai4", "悸": "ji4", "惨": "can3", "惯": "guan4", "扭": "niu3",
    "拒": "ju4", "拨": "bo1", "振": "zhen4", "搐": "chu4", "支": "zhi1",
    "收": "shou1", "昏": "hun1", "朗": "lang3", "木": "mu4", "构": "gou4",
    "柱": "zhu4", "歇": "xie1", "歉": "qian4", "氧": "yang3", "汇": "hui4",
    "汞": "gong3", "沫": "mo4", "洁": "jie2", "淋": "lin2", "淤": "yu1",
    "混": "hun4", "溢": "yi4", "滕": "teng2", "漢": "han4", "犯": "fan4",
    "狠": "hen3", "瓦": "wa3", "甲": "jia3", "界": "jie4", "畏": "wei4",
    "疲": "pi2", "疸": "dan3", "痒": "yang3", "瘙": "sao4", "瘫": "tan1",
    "癜": "dian4", "监": "jian1", "盗": "dao4", "眩": "xuan4",
    "睛": "jing1", "砰": "peng1", "碍": "ai4", "离": "li2", "端": "duan1",
    "符": "fu2", "简": "jian3", "粒": "li4", "糊": "hu2", "纠": "jiu1",
    "绝": "jue2", "绞": "jiao3", "绪": "xu4", "缩": "suo1", "罪": "zui4",
    "置": "zhi4", "耗": "hao4", "聋": "long2", "肌": "ji1", "肛": "gang1",
    "肢": "zhi1", "肩": "jian1", "脱": "tuo1", "膏": "gao1", "至": "zhi4",
    "舒": "shu1", "芜": "wu2", "萎": "wei3", "藤": "teng2", "誊": "teng2",
    "词": "ci2", "诶": "ei1", "跛": "bo3", "逆": "ni4", "透": "tou4",
    "速": "su4", "遍": "bian4", "采": "cai3", "钝": "dun4", "闭": "bi4",
    "阵": "zhen4", "限": "xian4", "障": "zhang4", "震": "zhen4",
    "颈": "jing3", "额": "e2", "颤": "chan4", "饥": "ji1", "鸣": "ming2",
    "鼾": "han1", "齿": "chi3", "琴": "qin2",
})

# Round-2d sweep 2: characters appearing in the REFERENCE's own Chinese
# text (hotword lists, prompts, docs — the domain this deployment serves)
# that still lacked a mapping, plus stragglers from the word lexicon.
PINYIN_TABLE.update({
    "临": "lin2", "亢": "kang4", "交": "jiao1", "依": "yi1", "侧": "ce4",
    "像": "xiang4", "兄": "xiong1", "兆": "zhao4", "兜": "dou1",
    "共": "gong4", "具": "ju4", "典": "dian3", "兼": "jian1",
    "冲": "chong1", "凭": "ping2", "函": "han2", "列": "lie4",
    "剑": "jian4", "剔": "ti1", "剧": "ju4", "割": "ge1", "匹": "pi3",
    "南": "nan2", "卧": "wo4", "双": "shuang1", "叹": "tan4", "吉": "ji2",
    "否": "fou3", "含": "han2", "启": "qi3", "咔": "ka1", "咖": "ka1",
    "响": "xiang3", "哒": "da1", "哮": "xiao4", "唯": "wei2", "啡": "fei1",
    "嗓": "sang3", "噪": "zao4", "围": "wei2", "域": "yu4", "堆": "dui1",
    "妇": "fu4", "孤": "gu1", "完": "wan2", "导": "dao3", "尝": "chang2",
    "尤": "you2", "尾": "wei3", "峰": "feng1", "巢": "chao2",
    "帧": "zhen1", "序": "xu4", "庭": "ting2", "弃": "qi4", "引": "yin3",
    "弥": "mi2", "形": "xing2", "径": "jing4", "循": "xun2", "志": "zhi4",
    "恒": "heng2", "截": "jie2", "戳": "chuo1", "扁": "bian3",
    "扰": "rao3", "抛": "pao1", "拟": "ni3", "择": "ze2", "括": "kuo4",
    "拷": "kao3", "挠": "nao2", "捉": "zhuo1", "捕": "bu3", "授": "shou4",
    "掉": "diao4", "插": "cha1", "握": "wo4", "擅": "shan4", "操": "cao1",
    "故": "gu4", "敛": "lian3", "旋": "xuan2", "旦": "dan4", "映": "ying4",
    "普": "pu3", "景": "jing3", "晰": "xi1", "替": "ti4", "杂": "za2",
    "架": "jia4", "栈": "zhan4", "框": "kuang4", "档": "dang4",
    "榨": "zha4", "歧": "qi2", "殊": "shu1", "汉": "han4", "池": "chi2",
    "污": "wu1", "沸": "fei4", "泄": "xie4", "浑": "hun2", "润": "run4",
    "添": "tian1", "渡": "du4", "渣": "zha1", "源": "yuan2", "滤": "lv4",
    "漏": "lou4", "激": "ji1", "灼": "zhuo2", "烈": "lie4", "焖": "men4",
    "狐": "hu2", "独": "du2", "瑟": "se4", "由": "you2", "痉": "jing4",
    "痫": "xian2", "癫": "dian1", "直": "zhi2", "睁": "zheng1",
    "瞬": "shun4", "础": "chu3", "神": "shen2", "祭": "ji4",
    "称": "cheng1", "穴": "xue2", "突": "tu1", "筒": "tong3",
    "策": "ce4", "签": "qian1", "繁": "fan2", "纯": "chun2", "绕": "rao4",
    "络": "luo4", "综": "zong1", "缀": "zhui4", "署": "shu3",
    "聪": "cong1", "胡": "hu2", "脐": "qi2", "腐": "fu3", "致": "zhi4",
    "苛": "ke1", "荐": "jian4", "融": "rong2", "覆": "fu4", "触": "chu4",
    "警": "jing3", "询": "xun2", "诱": "you4", "贝": "bei4", "资": "zi1",
    "跃": "yue4", "距": "ju4", "跨": "kua4", "踩": "cai3", "蹦": "beng4",
    "辅": "fu3", "迁": "qian1", "返": "fan3", "迟": "chi2", "递": "di4",
    "途": "tu2", "逗": "dou4", "逻": "luo2", "遵": "zun1", "配": "pei4",
    "阈": "yu4", "阻": "zu3", "阿": "a1", "际": "ji4", "隔": "ge2",
    "集": "ji2", "靠": "kao4", "韵": "yun4", "顺": "shun4", "须": "xu1",
    "顿": "dun4", "颅": "lu2", "饱": "bao3", "驻": "zhu4", "骤": "zhou4",
    "默": "mo4", "椎": "zhui1", "耕": "geng1", "馅": "xian4",
    "荷": "he2", "戏": "xi4",
})

# Round-3 sweep: characters used by the general SEGMENTATION lexicon
# (tts/segwords.py) that had no pronunciation entry — without these, the
# word_segment prosody stream could mark a word whose chars synthesize as
# bare char_<cp> fallbacks (一般/介绍/北京…).
PINYIN_TABLE.update({
    "专": "zhuan1", "乒": "ping1", "乓": "pang1", "京": "jing1",
    "介": "jie4", "仔": "zi3", "俗": "su2", "农": "nong2", "刮": "gua1",
    "励": "li4", "北": "bei3", "博": "bo2", "卫": "wei4", "咙": "long2",
    "哺": "bu3", "啤": "pi2", "嘴": "zui3", "圳": "zhen4", "圾": "ji1",
    "坚": "jian1", "垃": "la1", "塑": "su4", "妆": "zhuang1",
    "姓": "xing4", "娩": "mian3", "宵": "xiao1", "宾": "bin1",
    "屿": "yu3", "州": "zhou1", "巧": "qiao3", "广": "guang3",
    "庆": "qing4", "微": "wei1", "怀": "huai2", "惠": "hui4",
    "憋": "bie1", "戚": "qi1", "扬": "yang2", "承": "cheng2",
    "技": "ji4", "抖": "dou3", "抗": "kang4", "抵": "di3", "担": "dan1",
    "招": "zhao1", "拜": "bai4", "挛": "luan2", "旅": "lv3",
    "朵": "duo3", "材": "cai2", "棉": "mian2", "楚": "chu3",
    "橘": "ju2", "汁": "zhi1", "汽": "qi4", "沟": "gou1", "济": "ji4",
    "浪": "lang4", "淇": "qi2", "漠": "mo4", "烫": "tang4",
    "熬": "ao2", "玻": "bo1", "璃": "li2", "瓜": "gua1",
    "痊": "quan2", "皂": "zao4", "磁": "ci2", "礼": "li3",
    "篮": "lan2", "绍": "shao4", "绩": "ji4", "羽": "yu3",
    "翻": "fan1", "聘": "pin4", "股": "gu3", "脖": "bo2",
    "脸": "lian3", "膝": "xi1", "般": "ban1", "英": "ying1",
    "萄": "tao2", "葡": "pu2", "讨": "tao3", "诗": "shi1",
    "诺": "nuo4", "趾": "zhi3", "酱": "jiang4", "醋": "cu4",
    "革": "ge2", "饺": "jiao3", "鼓": "gu3", "龄": "ling2",
})

# Round-3d open-domain coverage batch: the round-3c blind eval showed the
# dominant miss class is chars with NO table entry at all (char_<cp>
# fallback), not disambiguation. This batch sweeps ~320 common chars from
# everyday domains (kinship, body/medical, cooking/household verbs, nature,
# flora/fauna, utensils, literary particles) with their standalone-most
# readings. Polyphones introduced here keep compounds in WORD_PINYIN
# (round-3d markers): 炸 zha4 default / zha2 cooking, 磅礴 pang2 bo2.
PINYIN_TABLE.update({
    "丘": "qiu1", "丸": "wan2", "幅": "fu2", "仰": "yang3", "伯": "bo2", "侄": "zhi2",
    "侬": "nong2", "俯": "fu3", "俺": "an3", "倦": "juan4", "傲": "ao4",
    "兮": "xi1", "兰": "lan2", "冽": "lie4", "凛": "lin3", "凰": "huang2",
    "凳": "deng4", "凿": "zao2", "剁": "duo4", "劈": "pi1", "叮": "ding1",
    "吻": "wen3", "咕": "gu1", "咬": "yao3", "哉": "zai1", "啃": "ken3",
    "喃": "nan2", "嘀": "di2", "嘱": "zhu3", "嘲": "chao2", "嚷": "rang3",
    "坡": "po1", "垄": "long3", "堵": "du3", "填": "tian2", "壤": "rang3",
    "壶": "hu2", "姑": "gu1", "娘": "niang2", "婉": "wan3", "婶": "shen3",
    "媳": "xi2", "嫂": "sao3", "寂": "ji4", "寥": "liao2", "尘": "chen2",
    "屉": "ti4", "屐": "ji1", "岭": "ling3", "峡": "xia2", "峦": "luan2",
    "峨": "e2", "崖": "ya2", "嶂": "zhang4", "巍": "wei1", "恋": "lian4",
    "悔": "hui3", "悟": "wu4", "惭": "can2", "愧": "kui4", "憨": "han1",
    "懊": "ao4", "扇": "shan4", "扑": "pu1", "扛": "kang2", "抚": "fu3",
    "拇": "mu3", "拌": "ban4", "拽": "zhuai4", "拾": "shi2", "挖": "wa1",
    "挚": "zhi4", "挡": "dang3", "捡": "jian3", "捣": "dao3", "捶": "chui2",
    "掀": "xian1", "掌": "zhang3", "掐": "qia1", "掘": "jue2", "掰": "bai1",
    "搀": "chan1", "搂": "lou3", "搓": "cuo1", "撕": "si1", "擀": "gan3",
    "攥": "zuan4", "敷": "fu1", "斓": "lan2", "斟": "zhen1", "旎": "ni3",
    "旖": "yi3", "旬": "xun2", "昼": "zhou4", "晒": "shai4", "晾": "liang4",
    "暮": "mu4", "曙": "shu3", "曦": "xi1", "杈": "cha4", "杏": "xing4",
    "枣": "zao3", "枫": "feng1", "柏": "bai3", "柚": "you4", "柳": "liu3",
    "柿": "shi4", "桃": "tao2", "桦": "hua4", "桩": "zhuang1", "桶": "tong3",
    "梅": "mei2", "梢": "shao1", "梨": "li2", "棘": "ji2", "椒": "jiao1",
    "榴": "liu2", "槐": "huai2", "橙": "cheng2", "橱": "chu2", "毡": "zhan1",
    "汐": "xi1", "沼": "zhao3", "泉": "quan2", "泞": "ning4", "泵": "beng4",
    "泼": "po1", "泽": "ze2", "洋": "yang2", "洞": "dong4", "浩": "hao4",
    "浸": "jin4", "涌": "yong3", "涛": "tao1", "涧": "jian4", "淌": "tang3",
    "淳": "chun2", "渺": "miao3", "湾": "wan1", "溅": "jian4", "溜": "liu1",
    "溪": "xi1", "滚": "gun3", "滨": "bin1", "滩": "tan1", "潭": "tan2",
    "潮": "chao2", "瀑": "pu4", "瀚": "han4", "灶": "zao4", "灸": "jiu3",
    "炖": "dun4", "炸": "zha4", "烘": "hong1", "烛": "zhu2", "焉": "yan1",
    "焚": "fen2", "熄": "xi1", "熏": "xun1", "燎": "liao2", "燕": "yan4",
    "爹": "die1", "琢": "zhuo2", "璀": "cui3", "璨": "can4", "瓣": "ban4",
    "畔": "pan4", "疝": "shan4", "痘": "dou4", "痪": "huan4", "痹": "bi4",
    "瘀": "yu1", "癣": "xuan3", "盆": "pen2", "眉": "mei2", "睫": "jie2",
    "瞒": "man2", "瞳": "tong2", "矣": "yi3", "砌": "qi4", "砸": "za2",
    "碟": "die2", "磅": "bang4", "磕": "ke1", "礁": "jiao1", "礴": "bo2",
    "穗": "sui4", "竹": "zhu2", "笋": "sun3", "笼": "long2", "筐": "kuang1",
    "筛": "shai1", "箩": "luo2", "篦": "bi4", "纱": "sha1", "绊": "ban4",
    "绒": "rong2", "绚": "xuan4", "绢": "juan4", "绣": "xiu4", "绸": "chou2",
    "缎": "duan4", "缸": "gang1", "罐": "guan4", "羞": "xiu1", "肘": "zhou3",
    "腌": "yan1", "腕": "wan4", "腱": "jian4", "臀": "tun2", "舀": "yao3",
    "舔": "tian3", "芦": "lu2", "芹": "qin2", "芽": "ya2", "苇": "wei3",
    "茎": "jing1", "茫": "mang2", "荆": "jing1", "莓": "mei2", "莲": "lian2",
    "莺": "ying1", "菇": "gu1", "菊": "ju2", "菠": "bo1", "萝": "luo2",
    "葱": "cong1", "蒜": "suan4", "蔓": "man4", "蕊": "rui3", "蕾": "lei3",
    "虚": "xu1", "虹": "hong2", "虾": "xia1", "蚓": "yin3", "蚕": "can2",
    "蚯": "qiu1", "蜗": "wo1", "蝉": "chan2", "蝶": "die2", "螂": "lang2",
    "螳": "tang2", "螺": "luo2", "蟀": "shuai4", "蟋": "xi1", "蟹": "xie4",
    "衫": "shan1", "裁": "cai2", "褥": "ru4", "讥": "ji1", "讽": "feng3",
    "诚": "cheng2", "诬": "wu1", "诽": "fei3", "谣": "yao2", "谤": "bang4",
    "谦": "qian1", "谷": "gu3", "豹": "bao4", "贬": "bian3", "趴": "pa1",
    "跪": "gui4", "跺": "duo4", "踝": "huai2", "踢": "ti1", "蹬": "deng1",
    "蹲": "dun1", "辩": "bian4", "迈": "mai4", "逸": "yi4", "遮": "zhe1",
    "酿": "niang4", "钉": "ding1", "铲": "chan3", "链": "lian4", "锤": "chui2",
    "锦": "jin3", "锯": "ju4", "镂": "lou4", "闩": "shuan1", "闯": "chuang3",
    "阀": "fa2", "陋": "lou4", "陵": "ling2", "雀": "que4", "雁": "yan4",
    "雅": "ya3", "雕": "diao1", "雹": "bao2", "霁": "ji4", "霞": "xia2",
    "霭": "ai3", "霾": "mai2", "靴": "xue1", "韧": "ren4", "韭": "jiu3",
    "颊": "jia2", "颚": "e4", "驳": "bo2", "驴": "lv2", "驼": "tuo2",
    "骄": "jiao1", "骆": "luo4", "骡": "luo2", "髓": "sui3", "鲤": "li3",
    "鲨": "sha1", "鲫": "ji4", "鲸": "jing1", "鳄": "e4", "鳖": "bie1",
    "鳗": "man2", "鸥": "ou1", "鸦": "ya1", "鸽": "ge1", "鹉": "wu3",
    "鹊": "que4", "鹤": "he4", "鹦": "ying1", "鹰": "ying1", "麓": "lu4",
})
