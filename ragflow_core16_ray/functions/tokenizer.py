"""Token counting + text normalization (pure functions, no external deps).

The reference counts tokens with tiktoken cl100k_base
(rag/utils/__init__.py:81-90) and normalizes full-width chars with
``_strQ2B`` (rag/nlp/rag_tokenizer.py:101-110). tiktoken is not present in
this sandbox, so we implement a deterministic BPE-ish regex tokenizer of the
same family (GPT-2-style word/number/punct splitting published in the GPT-2
code release, with CJK chars counted one per char, approximating cl100k's
behavior on CJK). All goldens and budgets in this repo use THIS counter, so
the engine is self-consistent.

The regexes are compiled at module import — i.e. once per Ray worker
process — so per-batch calls pay no compile cost (the actor-state rule from
SURVEY.md §2.3 for the tokenizer singleton, rag/nlp/rag_tokenizer.py:31-98).
"""

from __future__ import annotations

import regex as re

# GPT-2-family pretokenizer (public, from the GPT-2/tiktoken releases),
# with an extra CJK branch so each Han/Kana/Hangul char is its own token.
_TOKEN_RE = re.compile(
    r"[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]"
    r"|'(?:[sdmt]|ll|ve|re)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)"
    r"|\s+",
    re.UNICODE,
)

_WS_RE = re.compile(r"\s+")

# stdlib-re specialization of _TOKEN_RE for LOWERED PURE-ASCII text
# (≈2.4× faster than the regex module on the hottest call of every
# packing decision). Provably equivalent there: after .lower(), \p{L}
# over ASCII is [a-z], \p{N} is [0-9], and the regex module's \s over
# ASCII is exactly [ \t\n\r\f\v] (NOT \x1c-\x1f, which stdlib \s would
# include — hence the explicit classes). Equivalence is verified
# exhaustively over ASCII pairs + fuzz in tests/test_more_functions.py.
import re as _sre

_TOKEN_RE_ASCII = _sre.compile(
    r"'(?:[sdmt]|ll|ve|re)"
    r"| ?[a-z]+| ?[0-9]+| ?[^ \t\n\r\f\va-z0-9]+"
    r"|[ \t\n\r\f\v]+(?![^ \t\n\r\f\v])"
    r"|[ \t\n\r\f\v]+")

# ---- CJK segmentation: bidirectional maximum matching -------------------
# A small built-in lexicon (common Mandarin vocabulary + this corpus's
# data-processing domain terms — authored here, NOT the reference's huqie
# dictionary) gives multi-char CJK words; unmatched spans fall back to one
# token per char. Role of the reference's trie max-match tokenizer
# (rag/nlp/rag_tokenizer.py:217-263 forward/backward match, :119-167
# disambiguation) with the public BiMM heuristic in place of the DFS
# scoring: run forward and backward max-match, keep the segmentation with
# fewer tokens, then fewer single-char tokens, backward on ties.
_CJK_LEXICON = frozenset("""
数据 数据流 处理 批处理 表格 扫描 合并 排序 连接 过滤 窗口 分组 分片 分区
键值 向量 哈希 范围 溢出 算子 工作 调度 布局 锚点 图表 标题 边距 语料
标记 跨度 偏移 索引 质量 密度 提取 导航 页脚 侧栏 主文 内容 管道 引擎
集群 节点 内存 磁盘 缓存 文档 文件 系统 模型 计算 存储 网络 服务 任务
研究 研究生 生命 科学 学习 机器 智能 人工 语言 文字 中文 英文 时间 空间
问题 方法 结果 分析 设计 实现 测试 性能 优化 程序 代码 函数 参数 变量
目录 章节 段落 句子 词语 字符 编码 解码 压缩 加密 安全 错误 日志 监控
北京 上海 中国 美国 世界 国家 城市 公司 大学 学校 老师 学生 朋友 家庭
今天 明天 昨天 现在 未来 过去 开始 结束 继续 停止 增加 减少 提高 降低
""".split())
_CJK_MAX_WORD = max(map(len, _CJK_LEXICON))
_CJK_RUN_RE = re.compile(r"[\p{Han}]+")
# per-codepoint Han membership, alphabet-bounded memo (dict hit ≈ 20× faster
# than a regex call; tokenize sees every Han char as its own token)
_HAN_CHAR_CACHE: dict[str, bool] = {}


def _is_han_char(ch: str) -> bool:
    v = _HAN_CHAR_CACHE.get(ch)
    if v is None:
        v = _CJK_RUN_RE.match(ch) is not None
        _HAN_CHAR_CACHE[ch] = v
    return v
# chars that can START (resp. END) a lexicon word: any other char can only
# ever be a single-char token, so the max-match inner loop skips straight
# to it (most Han chars in real text are not in the compact lexicon)
_LEX_FIRST = frozenset(w[0] for w in _CJK_LEXICON)
_LEX_LAST = frozenset(w[-1] for w in _CJK_LEXICON)
# one C-level scan deciding "no lexicon word can occur in this run" — the
# common case for real Han text against a compact lexicon; without an
# anchor char the per-char max-match loop is provably all-singles
_ANCHOR_RE = re.compile("[" + re.escape("".join(_LEX_FIRST | _LEX_LAST)) + "]")


def _max_match(run: str, forward: bool) -> list[str]:
    out: list[str] = []
    i = 0
    n = len(run)
    anchors = _LEX_FIRST if forward else _LEX_LAST
    while i < n:
        ch = run[i] if forward else run[n - i - 1]
        if ch not in anchors:
            out.append(ch)
            i += 1
            continue
        for ln in range(min(_CJK_MAX_WORD, n - i), 0, -1):
            piece = (run[i:i + ln] if forward
                     else run[n - i - ln:n - i])
            if ln == 1 or piece in _CJK_LEXICON:
                out.append(piece)
                i += ln
                break
    if not forward:
        out.reverse()
    return out


def bimm_segment(run: str) -> list[str]:
    """Bidirectional maximum matching over a pure-CJK run.

    Fast paths (decision-identical): a run with no lexicon anchor char
    segments to all singles without entering the match loop, and when the
    forward pass is all singles the backward pass provably is too (no
    position starts a lexicon word ⇒ no word occurs anywhere)."""
    if len(run) == 1 or not _ANCHOR_RE.search(run):
        return list(run)
    fw = _max_match(run, True)
    if len(fw) == len(run):
        return fw
    bw = _max_match(run, False)
    if len(fw) != len(bw):
        return fw if len(fw) < len(bw) else bw
    fw_singles = sum(1 for w in fw if len(w) == 1)
    bw_singles = sum(1 for w in bw if len(w) == 1)
    return fw if fw_singles < bw_singles else bw


def tokenize(text: str) -> list[str]:
    """BPE-ish pretokenization; runs of Han chars are segmented with
    lexicon max-match instead of one-char-per-token, so CJK token budgets
    and section boundaries no longer hinge on whitespace. Input is
    normalized full→half width, traditional→simplified, lowercase first —
    the reference's chain (rag_tokenizer.tokenize:291-300)."""
    if not text:
        return []
    if text.isascii():
        # width/trad-simp normalization and Han merging are no-ops on
        # pure-ASCII text; skip them (the overwhelmingly common case)
        return _TOKEN_RE_ASCII.findall(text.lower())
    raw = _TOKEN_RE.findall(tradi2simp(str_q2b(text)).lower())
    out: list[str] = []
    run: list[str] = []

    def flush_run():
        if run:
            out.extend(bimm_segment("".join(run)))
            run.clear()

    for tok in raw:
        # pure-Han tokens from _TOKEN_RE are always single chars (the Han
        # branch is first in the alternation), so a dict-cached per-char
        # scriptcheck replaces two regex calls on the hottest loop; the
        # general fullmatch path is kept for safety on multi-char input
        if len(tok) == 1:
            if _is_han_char(tok):
                run.append(tok)  # adjacent pure-Han tokens form one run
            else:
                flush_run()
                out.append(tok)
            continue
        if _CJK_RUN_RE.fullmatch(tok):
            run.append(tok)
            continue
        if _CJK_RUN_RE.search(tok):
            # mixed token (e.g. " 数据流处理" captured by the ` ?\p{L}+`
            # branch): split Han runs out, keep the rest verbatim —
            # EXCEPT pure-whitespace remainders (the pretokenizer's
            # leading-space convention), which would otherwise become
            # phantom tokens inflating num_tokens at every script
            # boundary (the packing currency)
            flush_run()
            pos = 0
            for m in _CJK_RUN_RE.finditer(tok):
                if m.start() > pos and not tok[pos:m.start()].isspace():
                    out.append(tok[pos:m.start()])
                out.extend(bimm_segment(m.group(0)))
                pos = m.end()
            if pos < len(tok) and not tok[pos:].isspace():
                out.append(tok[pos:])
            continue
        flush_run()
        out.append(tok)
    flush_run()
    return out


_NUMERIC_RE = re.compile(r"[0-9,.\-]+$")
_HAN_TOKEN_RE = re.compile(r"[\p{Han}]{2,}$")


def _subsegment(w: str) -> list[str]:
    """Forward max-match over ``w`` with the whole-token match excluded,
    so a lexicon compound decomposes into its parts."""
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        for ln in range(min(_CJK_MAX_WORD, n - i), 0, -1):
            if i == 0 and ln == n:
                continue  # the token itself is not a decomposition
            piece = w[i:i + ln]
            if ln == 1 or piece in _CJK_LEXICON:
                out.append(piece)
                i += ln
                break
    return out


def fine_grained_tokenize(tokens: list[str]) -> list[str]:
    """Second-pass fine segmentation (semantics of
    rag/nlp/rag_tokenizer.py:364-402 fine_grained_tokenize): on a
    mostly-non-CJK token list, only '/'-compounds are split; on a CJK
    list, tokens of 3+ Han chars are re-segmented with the token itself
    excluded from the lexicon ('研究生' → '研究 生'), kept whole when the
    decomposition is all single chars (no real sub-words found) or the
    token is numeric/short."""
    if not tokens:
        return []
    han = sum(1 for t in tokens if t and _CJK_RE.match(t[0]))
    if han < 0.2 * len(tokens):
        out: list[str] = []
        for t in tokens:
            out.extend(t.split("/") if "/" in t else (t,))
        return out
    out = []
    for t in tokens:
        if len(t) < 3 or _NUMERIC_RE.fullmatch(t) or not _HAN_TOKEN_RE.fullmatch(t):
            out.append(t)
            continue
        pieces = _subsegment(t)
        if any(len(p) > 1 for p in pieces):
            out.extend(pieces)
        else:
            out.append(t)
    return out


def num_tokens(text: str) -> int:
    """Deterministic token count (the engine's chunk_token_num currency;
    role of rag/utils/__init__.py:81-90 num_tokens_from_string). Counts
    the max-match segmentation, so a CJK word is one budget unit. ASCII
    fast path: normalization and CJK merging cannot change the count, so
    skip them (this is the hot path of every packing decision)."""
    if not text:
        return 0
    if text.isascii():
        return len(_TOKEN_RE_ASCII.findall(text.lower()))
    return len(tokenize(text))


def ws_tokens(text: str) -> list[str]:
    """Plain whitespace tokenization (used by the SQL-oracled token-count
    query; trivially expressible in DuckDB)."""
    t = text.strip()
    if not t:
        return []
    return _WS_RE.split(t)


_Q2B_TABLE = {0x3000: 0x20}
_Q2B_TABLE.update({c: c - 0xFEE0 for c in range(0xFF01, 0xFF5F)})


def str_q2b(s: str) -> str:
    """Full-width → half-width normalization (semantics of
    rag/nlp/rag_tokenizer.py:101-110 _strQ2B: U+3000 → space, U+FF01–FF5E →
    ASCII). One C-level translate, not a per-char Python loop — this sits
    inside tokenize() on every merge/packing decision."""
    return s.translate(_Q2B_TABLE)


# traditional → simplified mapping for ~190 high-frequency characters
# (authored from general knowledge of the standard simplifications — the
# reference loads the full OpenCC-style table, rag/nlp/rag_tokenizer.py:
# 109-117 _tradi2simp; a compact table covers the overwhelming share of
# running text because character frequency is Zipfian)
_T2S_PAIRS = (
    "數数據据東东車车馬马鳥鸟龍龙門门問问間间開开關关時时書书長长風风雲云"
    "電电語语話话讀读寫写學学習习國国圖图團团園园圓圆遠远運运動动飛飞機机"
    "會会難难歡欢觀观見见現现規规視视覺觉親亲辦办協协華华萬万與与專专業业"
    "絲丝紅红綠绿線线組组織织經经統统計计設设許许認认識识證证議议記记訓训"
    "該该詳详試试詩诗誰谁調调談谈謝谢貝贝負负財财責责質质買买賣卖費费資资"
    "賽赛輕轻輪轮轉转載载農农遊游選选邊边釋释鐘钟鋼钢錄录錯错鍵键鎮镇閱阅"
    "陽阳陰阴際际隨随隱隐雖虽雙双雜杂離离須须頁页頂顶順顺領领頭头題题顏颜"
    "願愿類类顯显飯饭飲饮餘余館馆驗验體体髮发點点黨党齊齐齒齿廠厂廣广慶庆"
    "應应戰战戲戏擊击擴扩攝摄敗败標标樣样樹树橋桥檢检歲岁歷历歸归殘残氣气"
    "漢汉滿满濟济為为無无熱热愛爱狀状獨独獲获環环產产異异當当盤盘確确碼码"
    "積积稱称種种穩稳節节簡简純纯紙纸級级納纳維维網网總总縮缩繼继續续聽听"
    "聯联聲声職职腦脑臺台舊旧藝艺藥药號号虛虚衛卫裝装製制訊讯貢贡購购軟软"
    "較较辭辞達达過过還还這这進进連连週周鄉乡銀银錢钱閉闭陸陆雞鸡韓韩讓让"
    "訪访評评詞词譯译優优儲储傳传傷伤備备價价億亿們们個个倉仓偉伟側侧傑杰"
    "係系俠侠條条來来僅仅鬆松歐欧氫氢沒没淺浅測测灣湾爾尔牆墙獻献瑪玛礎础"
    "祕秘禮礼蘇苏蘭兰訂订變变豐丰貴贵賓宾趙赵軌轨輸输辯辩遞递鄰邻醫医釘钉"
    "針针鑑鉴閃闪隊队階阶駕驾騎骑驚惊魚鱼鮮鲜麗丽麥麦黃黄處处對对"
    "幾几壓压嚴严豎竖尋寻導导層层屬属島岛帶带師师幹干廢废彈弹惡恶"
)
_T2S = {ord(_T2S_PAIRS[i]): _T2S_PAIRS[i + 1]
        for i in range(0, len(_T2S_PAIRS), 2)}


def tradi2simp(s: str) -> str:
    """Traditional → simplified Chinese normalization (semantics of
    rag/nlp/rag_tokenizer.py:112-117 _tradi2simp, built-in table)."""
    return s.translate(_T2S)


_CJK_RE = re.compile(r"[\p{Han}]")
_LATIN_RE = re.compile(r"[A-Za-z]")


def is_english(texts: list[str]) -> bool:
    """Deterministic language check: full scan, no sampling (the reference
    samples with random.choices — rag/nlp/__init__.py:227-236,
    pdf_parser.py:1043-1050; we replace that with an exact ratio per the
    determinism requirement in SURVEY.md §2.6)."""
    latin = cjk = 0
    for t in texts:
        latin += len(_LATIN_RE.findall(t))
        cjk += len(_CJK_RE.findall(t))
    return latin >= cjk
