"""Composable index templates (MetadataIndexTemplateService semantics:
findV2Template priority win, composed_of-order resolution with the
template's own block last, same-priority overlap rejection at put)."""
import pytest

from sparksearch import templates as T


@pytest.fixture()
def reg(tmp_path):
    path = str(tmp_path / "templates.json")
    T.put_component_template(path, "ct_base", {"template": {
        "settings": {"index.number_of_shards": "8",
                     "index.refresh_interval": "1s"},
        "mappings": {"properties": {
            "url": {"type": "keyword"},
            "text": {"type": "text", "analyzer": "standard"}}}}})
    T.put_component_template(path, "ct_tuning", {"template": {
        "settings": {"index.refresh_interval": "30s"},
        "mappings": {"properties": {
            "text": {"analyzer": "english"},
            "lang": {"type": "keyword"}}}}})
    T.put_index_template(path, "logs", {
        "index_patterns": ["logs-*"], "priority": 10,
        "composed_of": ["ct_base", "ct_tuning"],
        "template": {
            "settings": {"index.number_of_replicas": "2"},
            "mappings": {"properties": {"warc_ts": {"type": "date"}}}}})
    T.put_index_template(path, "logs_archive", {
        "index_patterns": ["logs-archive-*"], "priority": 20,
        "template": {"settings": {"index.number_of_shards": "1"}}})
    T.put_index_template(path, "catchall", {
        "index_patterns": ["*"], "priority": 0})
    return path


def test_priority_win_and_overlap_report(reg):
    assert T.find_template(reg, "logs-2026.08") == "logs"
    assert T.find_template(reg, "logs-archive-1") == "logs_archive"
    assert T.find_template(reg, "web") == "catchall"
    sim = T.simulate_index(reg, "logs-archive-1")
    assert sim["matched_template"] == "logs_archive"
    assert sim["overlapping"] == ["catchall", "logs"]


def test_resolution_order(reg):
    r = T.resolve_template(reg, "logs")
    # ct_base set 8 shards; nothing later overrode it
    assert r["settings"]["index.number_of_shards"] == "8"
    # ct_tuning (later component) overrides ct_base
    assert r["settings"]["index.refresh_interval"] == "30s"
    # template's own block is last
    assert r["settings"]["index.number_of_replicas"] == "2"
    props = r["mappings"]["properties"]
    # deep merge: text keeps type from ct_base, analyzer from ct_tuning
    assert props["text"] == {"type": "text", "analyzer": "english"}
    assert props["url"] == {"type": "keyword"}
    assert props["lang"] == {"type": "keyword"}
    assert props["warc_ts"] == {"type": "date"}


def test_same_priority_overlap_rejected(reg):
    with pytest.raises(ValueError, match="overlapping"):
        T.put_index_template(reg, "logs2", {
            "index_patterns": ["logs-2026*"], "priority": 10})
    # different priority is fine
    T.put_index_template(reg, "logs2", {
        "index_patterns": ["logs-2026*"], "priority": 11})
    assert T.find_template(reg, "logs-2026.08") == "logs2"
    # replacing a template with itself never self-conflicts
    T.put_index_template(reg, "logs", {
        "index_patterns": ["logs-*"], "priority": 10})


def test_put_validation(reg, tmp_path):
    with pytest.raises(ValueError, match="index_patterns"):
        T.put_index_template(reg, "bad", {"priority": 1})
    with pytest.raises(ValueError, match="unknown component"):
        T.put_index_template(reg, "bad", {
            "index_patterns": ["x-*"], "composed_of": ["nope"]})
    with pytest.raises(ValueError, match="already exists"):
        T.put_index_template(reg, "logs", {
            "index_patterns": ["other-*"], "priority": 99}, create=True)
    with pytest.raises(ValueError, match="requires 'template'"):
        T.put_component_template(reg, "bad_ct", {"version": 1})


def test_component_delete_refused_while_in_use(reg):
    with pytest.raises(ValueError, match="in use"):
        T.delete_component_template(reg, "ct_base")
    T.delete_index_template(reg, "logs")
    T.delete_component_template(reg, "ct_base")  # now fine


def test_no_match_returns_none(tmp_path):
    path = str(tmp_path / "t.json")
    T.put_index_template(path, "only", {"index_patterns": ["a-*"]})
    assert T.find_template(path, "b-1") is None
    assert T.simulate_index(path, "b-1")["matched_template"] is None


@pytest.mark.parametrize("p1,p2,overlap", [
    ("logs-*", "*", True),
    ("logs-*", "logs-archive-*", True),
    ("logs-*", "metrics-*", False),
    ("a*b", "ab", True),
    ("a*b", "axxb", True),
    ("a*b", "ba", False),
    ("*", "*", True),
    ("abc", "abc", True),
    ("abc", "abd", False),
    ("a*c*e", "ab*de", True),   # "abcde" matches both
    ("a*c", "b*c", False),
])
def test_glob_overlap(p1, p2, overlap):
    assert T._globs_overlap(p1, p2) is overlap
    assert T._globs_overlap(p2, p1) is overlap
