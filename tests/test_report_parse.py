"""PDF-report parsing + corpus collector logic vs the reference semantics
(reference image.py:21-194, corpus.py:24-141), on synthetic page fixtures — the
layout rules are pure string transforms, so no PyMuPDF or proprietary PDFs are
needed to pin them.
"""

from construction_clip_tpu.data.report_parse import (
    ReportImage, ReportPage, detect_report_type, parse_report,
    parse_report_caption, project_name_from_filename, report_corpus_captions,
    regulation_text_lines)
from construction_clip_tpu.data.corpus import (
    crawl_page, crawl_wikipedia, tokenize)

# page-text fixtures straight from the reference's layout comments
# (image.py:85,94,102,106)
TEXT_A = ("公司內部文件，限內部審閱\n查核照片\n查核項目：\n查核項目：\n"
          "查核項目： 屋頂尚未整理\n半邊鷹架扶手先行\n")
TEXT_A_VIOLATION = ("公司內部文件，限內部審閱\n查核照片\n"
                    "查核項目： 缺失改善，開口未設護欄\n")
TEXT_B = "二.工程現況\n1. 人員均依規定量測體溫並記錄備查及工地提\n供酒精和之態樣。\n"
TEXT_C = ("說明：柱頭箍筋多數還未調整好，請多補照片，另\n柱牆接合鋼筋務必施作。\n"
          "缺失5\n改善照片與說明：\n")
TEXT_D = "工地現況\nA0南棟一樓整理，作為勞工休息區。\n泥作材料進場。\n"


def test_detect_report_type():
    assert detect_report_type(["封面\n", TEXT_A]) == "A"
    assert detect_report_type(["工程說明\n"]) == "B"
    assert detect_report_type(["缺失1\n"]) == "C"
    assert detect_report_type([TEXT_D]) == "D"
    assert detect_report_type(["無標記頁\n"]) == "E"
    # first marker hit wins, scanned page by page
    assert detect_report_type(["工程說明", "公司內部文件"]) == "B"


def test_project_name():
    assert project_name_from_filename(
        "20200921-邱董至大埔美榮勝廠房-品質及勞安查核報告.pdf") == "大埔美榮勝廠房"


def test_layout_a_caption():
    cap, ct = parse_report_caption(TEXT_A, "A", 2)
    assert cap == "屋頂尚未整理，半邊鷹架扶手先行"
    assert ct == "status"
    cap, ct = parse_report_caption(TEXT_A_VIOLATION, "A", 2)
    assert ct == "violation"
    assert cap == "開口未設護欄"  # the 缺失改善， prefix is stripped


def test_layout_b_caption():
    cap, ct = parse_report_caption(TEXT_B, "B", 1)
    assert cap == "人員均依規定量測體溫並記錄備查及工地提供酒精和之態樣。"
    assert ct == "status"


def test_layout_c_caption_and_sticky_type():
    cap, ct = parse_report_caption(TEXT_C, "C", 1)
    assert cap == "柱頭箍筋多數還未調整好，請多補照片，另柱牆接合鋼筋務必施作。"
    assert ct is None  # layout C never assigns caption_type (image.py:101-103)


def test_layout_d_caption_indexed_by_image():
    # image_index selects the sentence: parts = ['0', sentence1, sentence2, '']
    cap, ct = parse_report_caption(TEXT_D, "D", 2)
    assert cap == "A0南棟一樓整理，作為勞工休息區"
    cap, _ = parse_report_caption(TEXT_D, "D", 3)
    assert cap == "泥作材料進場"
    # out-of-range and empty-slot both fall back to the first sentence
    cap, _ = parse_report_caption(TEXT_D, "D", 4)
    assert cap == "A0南棟一樓整理，作為勞工休息區"
    cap, _ = parse_report_caption(TEXT_D, "D", 9)
    assert cap == "A0南棟一樓整理，作為勞工休息區"
    assert ct == "status"  # no 缺失 in the raw text
    _, ct = parse_report_caption("工地現況\n缺失：開口未防護。\n", "D", 2)
    assert ct == "violation"


def _imgs(n):
    return [ReportImage(ext="jpeg", data=b"\xff\xd8") for _ in range(n)]


def test_parse_report_driver():
    pages = [
        ReportPage("封面 公司內部文件\n", _imgs(1)),   # page 0 never walked
        ReportPage(TEXT_A, _imgs(3)),
        ReportPage(TEXT_A_VIOLATION, _imgs(2)),
    ]
    fname = "20200921-邱董至大埔美榮勝廠房-品質及勞安查核報告.pdf"
    anns, to_save, next_id, ct = parse_report(fname, pages)
    # page 1: images 2,3 emitted (first skipped); page 2: image 2 emitted
    assert [a["id"] for a in anns] == [2, 3, 5]  # ids gap over skipped firsts
    assert len(to_save) == 3
    assert anns[0]["caption"] == "屋頂尚未整理，半邊鷹架扶手先行"
    assert anns[0]["caption_type"] == "status"
    assert anns[2]["caption_type"] == "violation"
    assert ct == "violation"  # sticky value rides out of the file
    assert anns[0]["type"] == "A" and anns[0]["page"] == 2
    assert anns[0]["report_file_name"] == fname
    # image name: {date}_{project}_{page}_{idx}.{ext}
    assert to_save[0][0] == "20200921_大埔美榮勝廠房_2_2.jpeg"
    assert anns[0]["file_name"].endswith(to_save[0][0])


def test_parse_report_skip_words_abort_page():
    pages = [
        ReportPage(TEXT_A, []),
        ReportPage("查核項目： 工地名稱一覽\n", _imgs(3)),  # skip-word page
        ReportPage(TEXT_A, _imgs(2)),
    ]
    anns, to_save, _, _ = parse_report("20200921-x至工地-報告.pdf", pages)
    assert len(anns) == 1  # only the clean page contributes
    assert anns[0]["page"] == 3


def test_parse_report_type_e_produces_nothing():
    pages = [ReportPage("無標記\n", _imgs(2)), ReportPage("x\n", _imgs(2))]
    anns, to_save, next_id, _ = parse_report("20200101-a至b-c.pdf", pages)
    assert anns == [] and to_save == [] and next_id == 0


def test_report_corpus_captions():
    pages = [ReportPage("公司內部文件\n", _imgs(1)), ReportPage(TEXT_A, _imgs(2))]
    caps = report_corpus_captions(pages)
    # corpus path: EVERY image (incl. first) contributes (corpus.py:88-119)
    assert caps == ["屋頂尚未整理，半邊鷹架扶手先行"] * 2


def test_regulation_text_lines():
    page = "第一條、雇主對於工作場所甲\n第二條、防護具乙\n"
    lines = regulation_text_lines([page])
    # newline-strip, split 、, each segment loses its LAST char (corpus.py:134-137)
    assert lines == ["第一雇主對於工作場所甲第二防護具"]


WIKI_HTML = """
<html><body><h1>土木工程</h1>
<p>土木工程是一門工程學科。
<a href="/wiki/工程">工程</a>
<a href="/wiki/Category:學科">cat</a>
<a class="ext" href="/wiki/外部">ext</a>
</p>
<p>涵蓋結構與 <a href="/wiki/水利工程#cite_note-1">引文</a> 設計。</p>
</body></html>
"""

WIKI_HTML_2 = """
<html><body><h1>工程</h1><p>工程是改造自然的活動。</p></body></html>
"""


def test_crawl_page_parse():
    title, lines, urls = crawl_page(WIKI_HTML)
    assert title == "土木工程"
    # ("土木工程是一門工程學科" itself is dropped: it contains 一, which the
    # reference's token filter excludes — corpus.py:17)
    assert any("工程" in l for l in lines) and any("設計" in l for l in lines)
    # Category link and class-bearing and cite_note links excluded
    assert urls == ["https://zh.wikipedia.org/zh-tw/工程"]


def test_crawl_wikipedia_bfs_offline():
    fetched = []

    def fetch(url):
        fetched.append(url)
        return WIKI_HTML if "seed" in url else WIKI_HTML_2

    lines, titles = crawl_wikipedia(["http://local/seed"], num_layers=2,
                                    fetch=fetch)
    # layer 1: seed; layer 2: the one link it exposes
    assert fetched == ["http://local/seed", "https://zh.wikipedia.org/zh-tw/工程"]
    assert titles == ["土木工程", "工程"]
    assert any("活動" in l for l in lines)


def test_tokenize_reference_filters():
    # latin-bearing, digits, excluded punctuation (incl. 一 and ○) are dropped
    out = tokenize("工人未戴安全帽 abc 123 一 ○○ 防護具！")
    toks = out.split()
    assert "工人未戴安全帽" in toks and "防護具" in toks
    assert "abc" not in toks and "123" not in toks
    assert "一" not in toks and "○○" not in toks
