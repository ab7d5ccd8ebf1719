"""Source tests: Medline XML (S3), BioC XML (S4), JATS (S5), file loader
(S6) — mirrors MedlineXmlToTextFnTest / BiocToTextFnTest shapes on tiny
fixtures."""

from __future__ import annotations

import gzip

import pytest

from translator_tm_provider_pipelines_spark.sources import bioc, files, medline

MEDLINE_XML = """<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID Version="1">101</PMID>
      <Article>
        <Journal><JournalIssue><PubDate><Year>1997</Year></PubDate></JournalIssue></Journal>
        <ArticleTitle>A title.</ArticleTitle>
        <Abstract>
          <AbstractText>First part.</AbstractText>
          <AbstractText Label="METHODS">Second part.</AbstractText>
        </Abstract>
        <PublicationTypeList>
          <PublicationType UI="D016428">Journal Article</PublicationType>
        </PublicationTypeList>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>102</PMID>
      <Article>
        <Journal><JournalIssue><PubDate><MedlineDate>Winter 2003-2004</MedlineDate></PubDate></JournalIssue></Journal>
        <ArticleTitle>No abstract here.</ArticleTitle>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>
"""

BIOC_XML = """<?xml version="1.0"?>
<collection>
  <source>PMC</source>
  <document>
    <id>PMC1</id>
    <passage>
      <infon key="type">title</infon>
      <offset>0</offset>
      <text>Doc title.</text>
    </passage>
    <passage>
      <infon key="type">abstract</infon>
      <offset>11</offset>
      <text>Abstract body.</text>
    </passage>
  </document>
</collection>
"""

JATS_XML = """<?xml version="1.0"?>
<article xmlns:xlink="http://www.w3.org/1999/xlink">
  <front><article-meta>
    <article-id pub-id-type="doi">10.1101/001</article-id>
    <title-group><article-title>JATS title</article-title></title-group>
    <abstract><p>The abstract text.</p></abstract>
  </article-meta></front>
  <body>
    <sec><title>Introduction</title><p>Intro para one.</p><p>Intro para two.</p></sec>
    <sec><title>Methods</title><p>Methods para.</p></sec>
  </body>
</article>
"""


@pytest.fixture()
def medline_docs(spark, tmp_path):
    # gzipped on purpose: the reference reads *.xml.gz
    with gzip.open(tmp_path / "m.xml.gz", "wt") as f:
        f.write(MEDLINE_XML)
    raw = medline.read_medline_xml(spark, str(tmp_path))
    return medline.medline_documents(raw)


def test_medline_text_assembly(medline_docs):
    rows = {r.doc_id: r for r in medline_docs.collect()}
    assert set(rows) == {"PMID:101", "PMID:102"}
    assert rows["PMID:101"].content == "A title.\n\nFirst part.\n\nMETHODS: Second part."
    assert rows["PMID:102"].content == "No abstract here."


def test_medline_year_and_pubtypes(medline_docs):
    rows = {r.doc_id: r for r in medline_docs.collect()}
    assert rows["PMID:101"].pub_year == "1997"
    assert rows["PMID:101"].pub_types == ["Journal Article"]
    assert rows["PMID:102"].pub_year == "2003"  # from MedlineDate
    assert rows["PMID:102"].pub_types == []


def test_medline_section_annotations(medline_docs):
    annots = medline.medline_section_annotations(medline_docs)
    rows = {(r.doc_id, r.annot_type): r for r in annots.collect()}
    t = rows[("PMID:101", "title")]
    assert [tuple(s) for s in t.spans] == [(0, 8)] and t.covered_text == "A title."
    a = rows[("PMID:101", "abstract")]
    assert a.covered_text == "First part.\n\nMETHODS: Second part."
    assert ("PMID:102", "abstract") not in rows


def test_bioc_documents(spark, tmp_path):
    (tmp_path / "b.xml").write_text(BIOC_XML)
    docs = bioc.bioc_documents(bioc.read_bioc_xml(spark, str(tmp_path / "b.xml")))
    r = docs.collect()[0]
    assert r.doc_id == "PMC1"
    assert r.content == "Doc title.\n\nAbstract body."
    assert [(s.annot_type, s.start, s.end) for s in r.sections] == [
        ("title", 0, 10), ("abstract", 12, 26),
    ]
    annots = bioc.bioc_section_annotations(docs).collect()
    got = {r.annot_type: r.covered_text for r in annots}
    assert got == {"title": "Doc title.", "abstract": "Abstract body."}


def test_jats_documents(spark, tmp_path):
    (tmp_path / "j.xml").write_text(JATS_XML)
    r = bioc.jats_documents(spark, str(tmp_path / "j.xml")).collect()[0]
    assert r.doc_id == "10.1101/001"
    assert r.content.startswith("JATS title\n\nThe abstract text.")
    types = [s.annot_type for s in r.sections]
    assert types == ["title", "abstract", "introduction", "methods"]
    for s in r.sections:
        assert r.content[s.start:s.end] != ""


def test_load_files(spark, tmp_path):
    (tmp_path / "a.txt").write_text("content A")
    (tmp_path / "b.txt").write_text("content B")
    (tmp_path / "skip.json").write_text("{}")
    rows = {r.doc_id: r.content for r in files.load_files(spark, str(tmp_path)).collect()}
    assert rows == {"a": "content A", "b": "content B"}


MEDLINE_HTML_XML = """<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>201</PMID>
      <Article>
        <Journal><JournalIssue><PubDate><Year>2001</Year></PubDate></JournalIssue></Journal>
        <ArticleTitle>Effects of &lt;i&gt;E. coli&lt;/i&gt; growth.</ArticleTitle>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>202</PMID>
      <Article>
        <Journal><JournalIssue><PubDate><MedlineDate>Spring 1998-1999</MedlineDate></PubDate></JournalIssue></Journal>
        <ArticleTitle>Plain title.</ArticleTitle>
        <Abstract><AbstractText>H&lt;sub&gt;2&lt;/sub&gt;O is water.</AbstractText></Abstract>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>203</PMID>
      <Article>
        <Journal><JournalIssue><PubDate></PubDate></JournalIssue></Journal>
        <ArticleTitle>No markup anywhere.</ArticleTitle>
        <Abstract><AbstractText>Clean abstract.</AbstractText></Abstract>
        <ArticleDate DateType="Electronic"><Year>2015</Year><Month>06</Month></ArticleDate>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>
"""


@pytest.fixture()
def medline_html_raw(spark, tmp_path):
    (tmp_path / "h.xml").write_text(MEDLINE_HTML_XML)
    return medline.read_medline_xml(spark, str(tmp_path / "h.xml"))


def test_pmid_extractor_html_targets(medline_html_raw):
    """PmidExtractor parity: title <i> and abstract <sub> markup flag the
    article; the clean article lands in the does-not-contain set."""
    with_html = {r.pmid for r in medline.extract_pmids(medline_html_raw, True).collect()}
    without = {r.pmid for r in medline.extract_pmids(medline_html_raw, False).collect()}
    assert with_html == {"201", "202"}
    assert without == {"203"}


def test_pmid_to_year_sources(medline_html_raw):
    """PmidToYearExtractor parity: PubDate/Year, MedlineDate 4-digit run,
    ArticleDate fallback; 'PMID:' prefix on ids."""
    got = {r.pmid: r.year for r in medline.pmid_to_year(medline_html_raw).collect()}
    assert got == {"PMID:201": "2001", "PMID:202": "1998", "PMID:203": "2015"}


def test_pmid_to_year_null_year_raises(spark, tmp_path):
    (tmp_path / "bad.xml").write_text(
        """<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>301</PMID>
      <Article>
        <Journal><JournalIssue><PubDate><MedlineDate>no digits</MedlineDate></PubDate></JournalIssue></Journal>
        <ArticleTitle>t</ArticleTitle>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>
"""
    )
    raw = medline.read_medline_xml(spark, str(tmp_path / "bad.xml"))
    with pytest.raises(Exception, match="Null year"):
        medline.pmid_to_year(raw).collect()


UI_METADATA_XML = """<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>401</PMID>
      <Article>
        <Journal>
          <ISOAbbreviation>J Test</ISOAbbreviation>
          <Title>Journal of Testing</Title>
          <JournalIssue>
            <Volume>12</Volume>
            <Issue>3</Issue>
            <PubDate><Year>1999</Year><Month>05</Month><Day>3</Day></PubDate>
          </JournalIssue>
        </Journal>
        <ArticleTitle>Title one.</ArticleTitle>
        <Abstract><AbstractText>Line one
with break.</AbstractText></Abstract>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>402</PMID>
      <Article>
        <Journal><JournalIssue>
          <PubDate><MedlineDate>1997 May-Jun</MedlineDate></PubDate>
        </JournalIssue></Journal>
        <ArticleTitle>Title two.</ArticleTitle>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>403</PMID>
      <Article>
        <Journal><JournalIssue>
          <PubDate><MedlineDate>Winter 2003</MedlineDate></PubDate>
        </JournalIssue></Journal>
        <ArticleTitle>Title three.</ArticleTitle>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>404</PMID>
      <Article>
        <Journal><JournalIssue>
          <PubDate><Year>2010</Year><Season>Summer</Season></PubDate>
        </JournalIssue></Journal>
        <ArticleTitle>Title four.</ArticleTitle>
        <ArticleDate><Year>2010</Year><Month>8</Month><Day>9</Day></ArticleDate>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>405</PMID>
      <Article>
        <Journal><JournalIssue>
          <PubDate><MedlineDate>2004 Dec 15-31</MedlineDate></PubDate>
        </JournalIssue></Journal>
        <ArticleTitle>Title five.</ArticleTitle>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
  <DeleteCitation>
    <PMID Version="1">900</PMID>
    <PMID Version="1">901</PMID>
  </DeleteCitation>
</PubmedArticleSet>
"""


@pytest.fixture()
def ui_raw(spark, tmp_path):
    (tmp_path / "ui.xml").write_text(UI_METADATA_XML)
    return medline.read_medline_xml(spark, str(tmp_path / "ui.xml")), str(
        tmp_path / "ui.xml"
    )


def test_ui_metadata_rows(ui_raw):
    raw, _ = ui_raw
    rows = {r.DOC_ID: r for r in medline.ui_metadata(raw).collect()}
    r = rows["PMID:401"]
    assert (r.year, r.month, r.day) == ("1999", "May", "03")
    assert (r.journal, r.journal_abbrev, r.volume, r.issue) == (
        "Journal of Testing", "J Test", "12", "3"
    )
    assert r.article_abstract == "Line one with break."  # \n flattened
    # MedlineDate: first explicit month mention + 4-digit year
    assert (rows["PMID:402"].year, rows["PMID:402"].month) == ("1997", "May")
    assert rows["PMID:402"].day == "-"
    assert rows["PMID:402"].journal == "-"
    # season-pattern MedlineDate → approximate month
    assert (rows["PMID:403"].year, rows["PMID:403"].month) == ("2003", "Jan")
    # explicit Season element; ArticleDate ignored when PubDate resolves
    assert (rows["PMID:404"].year, rows["PMID:404"].month) == ("2010", "Jul")
    # MedlineDate day capture (the reference's group-13 Dec-only branch)
    assert (rows["PMID:405"].month, rows["PMID:405"].day) == ("Dec", "15")


def test_ui_metadata_article_date_fallback(spark, tmp_path):
    (tmp_path / "ad.xml").write_text(
        """<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>501</PMID>
      <Article>
        <Journal><JournalIssue><PubDate></PubDate></JournalIssue></Journal>
        <ArticleTitle>t</ArticleTitle>
        <ArticleDate><Year>2015</Year><Month>6</Month><Day>7</Day></ArticleDate>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>
"""
    )
    raw = medline.read_medline_xml(spark, str(tmp_path / "ad.xml"))
    r = medline.ui_metadata(raw).collect()[0]
    assert (r.year, r.month, r.day) == ("2015", "Jun", "07")


def test_deleted_pmids(spark, ui_raw):
    _, path = ui_raw
    got = {r.pmid for r in medline.deleted_pmids(spark, path).collect()}
    assert got == {"PMID:900", "PMID:901"}


def test_pmid_to_file(medline_html_raw):
    got = {(r.pmid, r.file) for r in medline.pmid_to_file(medline_html_raw).collect()}
    assert got == {("201", "h.xml"), ("202", "h.xml"), ("203", "h.xml")}


def test_download_script_lines():
    lines = medline.download_script_lines(
        "BASELINE", 1, 2, 24, dest_template="out/{file_set}_{year}/{file_name}"
    )
    assert len(lines) == 4  # 2 files + 2 md5 sidecars
    assert lines[0] == (
        "curl ftp://ftp.ncbi.nlm.nih.gov/pubmed/baseline/pubmed24n0001.xml.gz "
        "-o out/baseline_2024/pubmed24n0001.xml.gz"
    )
    assert lines[1].endswith("pubmed24n0001.xml.gz.md5")
    with pytest.raises(ValueError):
        medline.download_script_lines("weekly", 1, 1, 24)
