"""Non-UTF-8 charset recode + MIME gate test vectors (SURVEY O5/O7/O9 —
the seams VERDICT r1 flagged as untested)."""

import codecs

from aspseek_ray.functions.charset import (
    convert_to_text,
    decode_html,
    detect_charset,
    mime_allowed,
    register_extractor,
)
from aspseek_ray.functions.html import extract_text

RU = "привет мир"          # cp1251 / koi8-r encodable
DE = "größe straße"        # latin-1 encodable


def test_header_charset_wins():
    body = f"<p>{RU}</p>".encode("cp1251")
    assert detect_charset("text/html; charset=windows-1251", body) == "cp1251"
    assert decode_html(body, "text/html; charset=windows-1251") == f"<p>{RU}</p>"


def test_meta_charset_sniff():
    html = f'<html><head><meta charset="koi8-r"></head><body>{RU}</body></html>'
    body = html.encode("koi8-r")
    assert detect_charset(None, body) == "koi8-r"
    assert RU in decode_html(body)


def test_meta_http_equiv_sniff():
    html = ('<html><head><meta http-equiv="Content-Type" '
            f'content="text/html; charset=iso-8859-1"></head>{DE}</html>')
    body = html.encode("latin-1")
    assert detect_charset(None, body) == "iso8859-1"
    assert DE in decode_html(body)


def test_bom_detection():
    assert detect_charset(None, codecs.BOM_UTF16_LE + "x".encode("utf-16-le")) == "utf-16"
    assert decode_html(codecs.BOM_UTF8 + RU.encode("utf-8")) == RU


def test_unknown_charset_falls_back_to_utf8():
    assert detect_charset("text/html; charset=x-no-such-cs", b"abc") == "utf-8"
    # bad bytes never raise — replacement chars instead
    assert "�" in decode_html(b"\xff\xfe\xff garbage \xff",
                                   "text/html; charset=utf-8")


def test_recode_then_normative_extract():
    """The O7 seam composes with the pinned extractor: decode first, then
    extract_text on the str — identical result to a UTF-8 body."""
    html = f"<html><body><p>{RU}</p><p>{DE}</p></body></html>"
    via_cp1251 = extract_text(decode_html(
        html.encode("cp1251", errors="replace"),
        "text/html; charset=windows-1251"))
    via_utf8 = extract_text(html.encode("utf-8"))
    assert via_cp1251.split("\n")[0] == via_utf8.split("\n")[0] == RU


def test_mime_gate_and_converter_hook():
    assert mime_allowed("text/html; charset=utf-8")
    assert mime_allowed("text/plain")
    assert mime_allowed(None)
    assert not mime_allowed("image/png")
    register_extractor("application/x-fake", lambda b: b.decode("ascii").upper())
    assert mime_allowed("application/x-fake")
    assert convert_to_text("application/x-fake", b"hello") == "HELLO"
    assert convert_to_text("image/png", b"\x89PNG") is None
    assert convert_to_text("text/plain; charset=windows-1251",
                           RU.encode("cp1251")) == RU


# ----------------------------------------------- content-based guess (r3)
RU_LONG = ("мы обсуждаем вопросы науки и техники каждый вечер после "
           "работы в библиотеке города")


def test_unlabeled_cp1251_guessed():
    body = f"<html><body>{RU_LONG}</body></html>".encode("cp1251")
    assert detect_charset(None, body) == "cp1251"
    assert RU_LONG in decode_html(body)


def test_unlabeled_koi8r_guessed():
    body = f"<html><body>{RU_LONG}</body></html>".encode("koi8-r")
    assert detect_charset(None, body) == "koi8-r"
    assert RU_LONG in decode_html(body)


def test_unlabeled_latin1_guessed_decodes():
    text = "la journée était très belle près de la fenêtre de l'école"
    body = f"<html><body>{text}</body></html>".encode("latin-1")
    assert text in decode_html(body)


def test_unlabeled_utf8_stays_utf8():
    body = f"<html><body>{RU_LONG}</body></html>".encode("utf-8")
    assert detect_charset(None, body) == "utf-8"
    assert RU_LONG in decode_html(body)


def test_unlabeled_ascii_stays_utf8():
    assert detect_charset(None, b"<html><body>plain text</body></html>") == "utf-8"


def test_unknown_encoding_abstains():
    """Bodies in encodings outside the trained profiles (shift_jis, gbk,
    binary) must NOT get a confident 8-bit label — the guesser abstains
    and the caller keeps the safe utf-8+replace fallback."""
    from aspseek_ray.functions.charguess import guess_charset

    ja = "日本語のテキストです。漢字と仮名が含まれています。" * 4
    zh = "这是一段用于字符编码检测的中文示例文本。" * 5
    assert guess_charset(ja.encode("shift_jis")) is None
    assert guess_charset(zh.encode("gbk")) is None
    assert guess_charset(bytes(range(256)) * 16) is None
    # trained profiles still guessed
    assert guess_charset(RU_LONG.encode("cp1251")) == "cp1251"
    assert guess_charset(RU_LONG.encode("koi8-r")) == "koi8-r"


def test_labels_still_beat_the_guesser():
    # an explicit (wrong) label must win over the content guess
    body = f"<html><body>{RU_LONG}</body></html>".encode("cp1251")
    assert detect_charset("text/html; charset=koi8-r", body) == "koi8-r"


def test_sniff_window_truncation_keeps_utf8():
    # multi-byte char cut exactly at the 2048-byte window boundary
    pad = b"a" * 2047
    body = pad + "я".encode("utf-8") + ("я" * 50).encode("utf-8")
    assert detect_charset(None, body) == "utf-8"


# ---- CJK recode vectors (round 5; SURVEY O7 etc/charsets/ table set —
# recode itself is the stdlib codec, detection honors the legacy web
# labels via the alias map)

CJK_SAMPLES = [
    # (web label, codec it must resolve to, sample text)
    ("shift_jis", "shift_jis", "日本語のテキストです。検索エンジン。"),
    ("x-sjis", "shift_jis", "漢字とかなの混在行。"),
    ("euc-jp", "euc_jp", "インデックス構築。"),
    ("x-euc-jp", "euc_jp", "形態素解析は未対応。"),
    ("gb2312", "gb2312", "中文测试文本。搜索引擎。"),
    ("x-gbk", "gbk", "简体中文网页内容。"),
    ("big5", "big5", "繁體中文測試。"),
    ("cn-big5", "big5", "檢索系統。"),
    ("ks_c_5601-1987", "cp949", "한국어 텍스트입니다."),
    ("euc-kr", "euc_kr", "검색 엔진 색인."),
    ("iso-2022-jp", "iso2022_jp", "メールでよく使う符号化。"),
]


def test_cjk_content_type_labels_resolve_and_roundtrip():
    from aspseek_ray.functions.charset import decode_html, detect_charset

    for label, codec, text in CJK_SAMPLES:
        body = f"<html><body>{text}</body></html>".encode(codec)
        got = detect_charset(f"text/html; charset={label}", body)
        assert got == __import__("codecs").lookup(codec).name, (label, got)
        assert text in decode_html(body, f"text/html; charset={label}")


def test_cjk_meta_tag_labels_roundtrip():
    from aspseek_ray.functions.charset import decode_html

    for label, codec, text in CJK_SAMPLES:
        if codec == "iso2022_jp":
            continue    # ESC sequences inside HTML attrs are not a
                        # realistic meta-labeled body
        body = (f'<html><head><meta charset="{label}"></head>'
                f"<body>{text}</body></html>").encode(codec)
        assert text in decode_html(body)


def test_cjk_unlabeled_falls_back_to_utf8_replacement():
    # the n-gram guesser is trained on cyrillic/latin only — unlabeled
    # CJK must ABSTAIN (no misdetection) and decode as utf-8/replace
    from aspseek_ray.functions.charset import detect_charset

    body = "日本語のテキストです。".encode("shift_jis") * 40
    assert detect_charset(None, body) == "utf-8"
