"""Han → pinyin romanization for table field naming.

Role of the reference's ``PY.get_pinyins(header, '_')`` field naming
(rag/app/table.py:196-211): a Chinese column header becomes a
pinyin-joined identifier before the type suffix. pypinyin is absent in
this sandbox, so a compact built-in table (authored from general
knowledge of standard Mandarin readings — NOT extracted from any
dictionary file) covers the high-frequency characters that actually
appear in table headers; character frequency is Zipfian, so a few
hundred entries cover the overwhelming share of real headers. Unknown
Han characters fall back to the caller's slug behavior (kept verbatim),
which keeps naming deterministic and collision-safe rather than wrong.
"""

from __future__ import annotations

# char: reading, one line per theme for reviewability
_PAIRS = """
数shu 据ju 表biao 列lie 行hang 项xiang 值zhi 量liang 组zu 类lei 型xing
名ming 称cheng 姓xing 性xing 别bie 年nian 龄ling 月yue 日ri 期qi 时shi
间jian 分fen 秒miao 周zhou 天tian 号hao 编bian 序xu 索suo 引yin
金jin 额e 价jia 格ge 费fei 用yong 成cheng 本ben 利li 润run 税shui 率lv
收shou 入ru 支zhi 出chu 余yu 总zong 计ji 合he 平ping 均jun 最zui 高gao
低di 大da 小xiao 长chang 宽kuan 深shen 重zhong 速su 温wen 湿shi 压ya
力li 电dian 流liu 功gong 能neng 效xiao 版ban 次ci 级ji 等deng 优you
先xian 顺shun 逆ni 向xiang 正zheng 反fan 男nan 女nv 是shi 否fou 有you
无wu 真zhen 假jia 单dan 位wei 部bu 门men 员yuan 工gong 资zi 人ren
地di 址zhi 城cheng 市shi 省sheng 区qu 县xian 街jie 道dao 路lu 国guo
家jia 话hua 机ji 邮you 箱xiang 码ma 状zhuang 态tai 备bei 注zhu 说shuo
明ming 描miao 述shu 内nei 容rong 标biao 题ti 文wen 档dang 件jian 夹jia
径jing 链lian 接jie 图tu 片pian 视shi 频pin 音yin 颜yan 色se 开kai
始shi 结jie 束shu 创chuang 建jian 更geng 新xin 删shan 除chu 改gai
查cha 询xun 字zi 段duan 页ye 品pin 商shang 货huo 库ku 存cun 销xiao
售shou 订ding 购gou 买mai 卖mai 客ke 户hu 供gong 应ying 产chan 出chu
厂chang 牌pai 款kuan 式shi 折zhe 扣kou 积ji 学xue 校xiao 班ban 课ke
程cheng 绩ji 考kao 试shi 题ti 答da 案an 师shi 生sheng 研yan 究jiu
"""
# build defensively: skip any token whose first char is not Han or whose
# tail is not ascii letters
_PINYIN: dict[int, str] = {}
for _tok in _PAIRS.split():
    _head, _tail = _tok[0], _tok[1:]
    if "一" <= _head <= "鿿" and _tail.isascii() and _tail.isalpha():
        _PINYIN.setdefault(ord(_head), "_" + _tail + "_")


def pinyinize(s: str) -> str:
    """Replace known Han chars with ``_<pinyin>_`` (collapsed by the
    caller's slug pass); unknown chars pass through unchanged."""
    return s.translate(_PINYIN)
