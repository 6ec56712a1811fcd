"""Polyphone disambiguation + erhua data for the TTS text frontend.

Rule data replacing the corresponding part of the reference's native
`ttsfrd` frontend (tts-service/Dockerfile:61-64; survey §7 hard part:
"TTS text frontend"). WORD_PINYIN holds the top polyphonic characters in
their disambiguating compounds (word → tone-numbered pinyin, space
separated); the G2P segments text greedy-longest-match against it before
falling back to per-character readings. ERHUA_WORDS lists the lexicalized
儿化 words whose trailing 儿 rhotacizes the previous final instead of being
its own syllable.
"""

# word → pinyin (space-separated, tone-numbered). Covers the common
# polyphones 行/重/长/得/乐/觉/教/血/数/便/调/发/还/着/了/背/结/切/率/当/
# 只/种/好/空/干/传/应/差/答/晕/处/系/转/累/咽/看/正/分/量/相/更/几/假/
# 恶/塞/卡/给/难/降/脏/地 in their frequent compounds, with extra weight on
# the medical domain the reference serves.
WORD_PINYIN = {
    # 行 xing2 / hang2
    "银行": "yin2 hang2", "行业": "hang2 ye4", "一行": "yi4 hang2",
    "行走": "xing2 zou3", "进行": "jin4 xing2", "行为": "xing2 wei2",
    "不行": "bu4 xing2", "运行": "yun4 xing2", "执行": "zhi2 xing2",
    # 重 zhong4 / chong2
    "重要": "zhong4 yao4", "体重": "ti3 zhong4", "严重": "yan2 zhong4",
    "重量": "zhong4 liang4", "重度": "zhong4 du4",
    "重复": "chong2 fu4", "重新": "chong2 xin1", "重来": "chong2 lai2",
    "重建": "chong2 jian4",
    # 长 chang2 / zhang3
    "长期": "chang2 qi1", "长度": "chang2 du4", "延长": "yan2 chang2",
    "长时间": "chang2 shi2 jian1",
    "长大": "zhang3 da4", "成长": "cheng2 zhang3", "增长": "zeng1 zhang3",
    "院长": "yuan4 zhang3", "生长": "sheng1 zhang3", "家长": "jia1 zhang3",
    # 得 de2 / dei3 / de5
    "得到": "de2 dao4", "获得": "huo4 de2", "得分": "de2 fen1",
    "取得": "qu3 de2", "觉得": "jue2 de5", "记得": "ji4 de5",
    "显得": "xian3 de5", "值得": "zhi2 de5",
    # 乐 le4 / yue4
    "快乐": "kuai4 le4", "乐观": "le4 guan1", "音乐": "yin1 yue4",
    "乐器": "yue4 qi4",
    # 觉 jue2 / jiao4
    "感觉": "gan3 jue2", "睡觉": "shui4 jiao4", "午觉": "wu3 jiao4",
    # 教 jiao4 / jiao1
    "教育": "jiao4 yu4", "教室": "jiao4 shi4", "请教": "qing3 jiao4",
    "教书": "jiao1 shu1", "教给": "jiao1 gei3",
    # 血 xue4 / xie3
    "血压": "xue4 ya1", "血糖": "xue4 tang2", "血脂": "xue4 zhi1",
    "血液": "xue4 ye4", "贫血": "pin2 xue4", "血管": "xue4 guan3",
    "血常规": "xue4 chang2 gui1", "流血": "liu2 xie3",
    # 数 shu4 / shu3
    "数字": "shu4 zi4", "数量": "shu4 liang4", "次数": "ci4 shu4",
    "数值": "shu4 zhi2", "指数": "zhi3 shu4", "数一数": "shu3 yi4 shu3",
    # 便 bian4 / pian2
    "方便": "fang1 bian4", "大便": "da4 bian4", "小便": "xiao3 bian4",
    "便秘": "bian4 mi4", "便宜": "pian2 yi5",
    # 调 tiao2 / diao4
    "调整": "tiao2 zheng3", "调节": "tiao2 jie2", "调理": "tiao2 li3",
    "调查": "diao4 cha2", "音调": "yin1 diao4",
    # 发 fa1 / fa4
    "发现": "fa1 xian4", "发烧": "fa1 shao1", "发炎": "fa1 yan2",
    "复发": "fu4 fa1", "头发": "tou2 fa4", "理发": "li3 fa4",
    # 还 hai2 / huan2
    "还有": "hai2 you3", "还是": "hai2 shi4", "还要": "hai2 yao4",
    "归还": "gui1 huan2", "还款": "huan2 kuan3",
    # 着 zhe5 / zhao2 / zhuo2
    "着急": "zhao2 ji2", "着凉": "zhao2 liang2", "睡着": "shui4 zhao2",
    "穿着": "chuan1 zhuo2", "附着": "fu4 zhuo2",
    # 了 le5 / liao3
    "了解": "liao3 jie3", "了不起": "liao3 bu5 qi3",
    # 背 bei4 / bei1
    "背部": "bei4 bu4", "后背": "hou4 bei4", "背包": "bei1 bao1",
    # 结 jie2 / jie1
    "结果": "jie2 guo3", "结石": "jie2 shi2", "结论": "jie2 lun4",
    "结实": "jie1 shi5",
    # 切 qie4 / qie1
    "一切": "yi2 qie4", "密切": "mi4 qie4", "切除": "qie1 chu2",
    "切开": "qie1 kai1",
    # 率 lv4 / shuai4
    "心率": "xin1 lv4", "概率": "gai4 lv4", "效率": "xiao4 lv4",
    "率领": "shuai4 ling3",
    # 当 dang1 / dang4
    "当时": "dang1 shi2", "应当": "ying1 dang1", "上当": "shang4 dang4",
    "当作": "dang4 zuo4",
    # 只 zhi3 / zhi1
    "只有": "zhi3 you3", "只是": "zhi3 shi4", "一只": "yi4 zhi1",
    # 种 zhong3 / zhong4
    "种类": "zhong3 lei4", "一种": "yi4 zhong3", "种植": "zhong4 zhi2",
    "接种": "jie1 zhong4",
    # 好 hao3 / hao4
    "爱好": "ai4 hao4", "好奇": "hao4 qi2",
    # 空 kong1 / kong4
    "空气": "kong1 qi4", "天空": "tian1 kong1", "空腹": "kong1 fu4",
    "空闲": "kong4 xian2", "有空": "you3 kong4",
    # 干 gan1 / gan4
    "干燥": "gan1 zao4", "干净": "gan1 jing4", "饼干": "bing3 gan1",
    "干活": "gan4 huo2", "能干": "neng2 gan4",
    # 传 chuan2 / zhuan4
    "传染": "chuan2 ran3", "遗传": "yi2 chuan2", "宣传": "xuan1 chuan2",
    "传记": "zhuan4 ji4",
    # 应 ying1 / ying4
    "应该": "ying1 gai1", "反应": "fan3 ying4", "应用": "ying4 yong4",
    "适应": "shi4 ying4",
    # 差 cha4 / cha1 / chai1
    "差不多": "cha4 bu5 duo1", "很差": "hen3 cha4", "差异": "cha1 yi4",
    "误差": "wu4 cha1", "出差": "chu1 chai1",
    # 答 da2 / da1
    "回答": "hui2 da2", "答案": "da2 an4", "答应": "da1 ying5",
    # 晕 yun1 / yun4
    "头晕": "tou2 yun1", "晕倒": "yun1 dao3", "晕车": "yun4 che1",
    # 处 chu4 / chu3
    "好处": "hao3 chu4", "到处": "dao4 chu4", "处理": "chu3 li3",
    "处方": "chu3 fang1", "处于": "chu3 yu2",
    # 系 xi4 / ji4
    "关系": "guan1 xi4", "系统": "xi4 tong3", "系鞋带": "ji4 xie2 dai4",
    # 转 zhuan3 / zhuan4
    "转变": "zhuan3 bian4", "好转": "hao3 zhuan3", "转诊": "zhuan3 zhen3",
    "转圈": "zhuan4 quan1",
    # 累 lei4 / lei3
    "劳累": "lao2 lei4", "很累": "hen3 lei4", "积累": "ji1 lei3",
    # 咽 yan1 / yan4
    "咽喉": "yan1 hou2", "咽部": "yan1 bu4", "吞咽": "tun1 yan4",
    # 看 kan4 / kan1
    "看病": "kan4 bing4", "看护": "kan1 hu4",
    # 正 zheng4 / zheng1
    "正常": "zheng4 chang2", "正月": "zheng1 yue4",
    # 分 fen1 / fen4
    "分析": "fen1 xi1", "分钟": "fen1 zhong1", "部分": "bu4 fen4",
    "分量": "fen4 liang4", "充分": "chong1 fen4",
    # 量 liang4 / liang2
    "质量": "zhi4 liang4", "剂量": "ji4 liang4", "用量": "yong4 liang4",
    "测量": "ce4 liang2", "量血压": "liang2 xue4 ya1",
    # 相 xiang1 / xiang4
    "相关": "xiang1 guan1", "互相": "hu4 xiang1", "照相": "zhao4 xiang4",
    "相片": "xiang4 pian4",
    # 更 geng4 / geng1
    "更加": "geng4 jia1", "更好": "geng4 hao3", "更换": "geng1 huan4",
    "更新": "geng1 xin1",
    # 几 ji3 / ji1
    "几个": "ji3 ge4", "几乎": "ji1 hu1",
    # 假 jia3 / jia4
    "假设": "jia3 she4", "假性": "jia3 xing4", "放假": "fang4 jia4",
    "假期": "jia4 qi1",
    # 恶 e4 / e3 / wu4
    "恶化": "e4 hua4", "恶性": "e4 xing4", "恶心": "e3 xin1",
    "厌恶": "yan4 wu4",
    # 塞 sai1 / se4
    "栓塞": "shuan1 se4", "梗塞": "geng3 se4", "塞住": "sai1 zhu4",
    # 卡 ka3 / qia3
    "卡片": "ka3 pian4", "卡住": "qia3 zhu4",
    # 给 gei3 / ji3
    "给予": "ji3 yu3",
    # 难 nan2 / nan4
    "困难": "kun4 nan5", "难受": "nan2 shou4", "灾难": "zai1 nan4",
    "难民": "nan4 min2",
    # 降 jiang4 / xiang2
    "下降": "xia4 jiang4", "降低": "jiang4 di1", "降压": "jiang4 ya1",
    "投降": "tou2 xiang2",
    # 脏 zang4 / zang1
    "心脏": "xin1 zang4", "肾脏": "shen4 zang4", "肝脏": "gan1 zang4",
    "内脏": "nei4 zang4", "很脏": "hen3 zang1",
    # 地 di4 / de5 (adverbial 地 needs POS; lexicalize the frequent ones)
    "地方": "di4 fang1", "地点": "di4 dian3", "慢慢地": "man4 man4 de5",
    "好好地": "hao3 hao3 de5",
    # 供 gong1 / gong4
    "提供": "ti2 gong1", "供奉": "gong4 feng4",
    # 缝 feng2 / feng4
    "缝合": "feng2 he2", "裂缝": "lie4 feng4",
    # 弹 tan2 / dan4
    "弹性": "tan2 xing4", "子弹": "zi3 dan4",
    # 薄 bo2 / bao2
    "薄弱": "bo2 ruo4", "很薄": "hen3 bao2",
    # 中 zhong1 / zhong4 (medical: 中风/中暑/中毒)
    "中风": "zhong4 feng1", "中暑": "zhong4 shu3", "中毒": "zhong4 du2",
    "击中": "ji1 zhong4", "中奖": "zhong4 jiang3",
    # 吐 tu3 / tu4
    "呕吐": "ou3 tu4", "吐血": "tu4 xie3", "吐出": "tu3 chu1",
    # 散 san4 / san3
    "散步": "san4 bu4", "松散": "song1 san3", "散剂": "san3 ji4",
    "扩散": "kuo4 san4",
    # 倒 dao3 / dao4
    "摔倒": "shuai1 dao3", "跌倒": "die1 dao3", "倒水": "dao4 shui3",
    "倒是": "dao4 shi4", "倒立": "dao4 li4",
    # 扎 zha1 / za1
    "扎针": "zha1 zhen1", "结扎": "jie2 za1", "包扎": "bao1 za1",
    # 创 chuang1 / chuang4
    "创伤": "chuang1 shang1", "创口": "chuang1 kou3",
    "创可贴": "chuang1 ke3 tie1", "创造": "chuang4 zao4",
    "创新": "chuang4 xin1",
    # 咽 third reading ye4
    "哽咽": "geng3 ye4",
    # 调剂 (pharmacy) tiao2
    "调剂": "tiao2 ji4",
    # 量体温 liang2
    "量体温": "liang2 ti3 wen1",
    # 脉 mai4 (号脉/脉搏 keep default); 提防 di1
    "脉搏": "mai4 bo2", "提防": "di1 fang2",
    # 钥匙 shi5
    "钥匙": "yao4 shi5",
    # 数落 shu3
    "数落": "shu3 luo5",
}

# lexicalized 儿化 words: the trailing 儿 rhotacizes the previous final
ERHUA_WORDS = {
    "这儿", "那儿", "哪儿", "一点儿", "有点儿", "一会儿", "等会儿",
    "玩儿", "味儿", "劲儿", "事儿", "花儿", "鸟儿", "个儿", "份儿",
    "头儿", "门儿", "面儿", "边儿", "小孩儿", "大伙儿", "没事儿",
}
