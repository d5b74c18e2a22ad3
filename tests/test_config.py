"""Config loading (GushConfig analog — reference
util/GushConfig.scala:20-22,37-59). Pure python, no Spark."""

from gush_spark.config import DEFAULT_CONFIG, GushSparkConfig


def test_defaults():
    c = DEFAULT_CONFIG
    assert c.ignored_hosts == () and c.ignored_url_prefixes == ()
    assert c.window_duration == "10 minutes"
    assert c.max_files_per_trigger == 4


def test_from_yaml_subset(tmp_path):
    p = tmp_path / "gush.yml"
    p.write_text(
        """
# comment
ignored_hosts: [spam.example, ads.example]
ignored_url_prefixes: [https://spam]
window_duration: 5 minutes
max_files_per_trigger: 2
skew_salt_buckets: 16
custom_key: custom_value
"""
    )
    c = GushSparkConfig.from_yaml(p)
    assert c.ignored_hosts == ("spam.example", "ads.example")
    assert c.ignored_url_prefixes == ("https://spam",)
    assert c.window_duration == "5 minutes"
    assert c.max_files_per_trigger == 2
    assert c.skew_salt_buckets == 16
    assert c.extra["custom_key"] == "custom_value"


def test_from_yaml_empty_lists(tmp_path):
    p = tmp_path / "gush.yml"
    p.write_text("ignored_hosts: []\n")
    c = GushSparkConfig.from_yaml(p)
    assert c.ignored_hosts == ()
