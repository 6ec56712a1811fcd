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
})
