"""Config reader (S6) + runner (U2/O1-O3) tests."""

from __future__ import annotations

import os

import pytest

from etl_property_rumah123_spark.config import (
    ExtractConfig,
    RegionConfig,
    _parse_yaml_subset,
    extract_config,
    load_config,
    read_config,
)
from etl_property_rumah123_spark.runner import (
    extract_all_regions,
    run_region_pipeline,
)
from etl_property_rumah123_spark.sources.fixtures import ADMINS, write_fixture_pages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_read_config_parses_reference_shape():
    cfg = extract_config(read_config(os.path.join(REPO, "configs/extract.yaml")))
    assert len(cfg.regions) == 6
    assert cfg.regions[0].id == "dki-jakarta"
    assert cfg.regions[0].admins == ["Jakarta", "Kepulauan Seribu"]
    assert (cfg.ads_type, cfg.property_type, cfg.num_pages) == ("jual", "rumah", 20)
    lc = load_config(read_config(os.path.join(REPO, "configs/load.yaml")))
    assert (lc.stg_table, lc.main_table, lc.unique_key, lc.batch_size) == (
        "stg_property_rumah", "property_rumah", "link", 500,
    )


def test_fallback_parser_matches_pyyaml():
    text = open(os.path.join(REPO, "configs/extract.yaml")).read()
    import yaml

    assert extract_config(_parse_yaml_subset(text)) == extract_config(
        yaml.safe_load(text)
    )


def test_cluster_profile_loads_and_applies():
    """configs/cluster.yaml parses identically via PyYAML and the
    fallback parser (dotted spark keys, quoted values), every value is
    a string, and get_spark(profile=...) rejects unknown profiles."""
    import pytest
    import yaml

    from etl_property_rumah123_spark.session import cluster_profile, get_spark

    text = open(os.path.join(REPO, "configs/cluster.yaml")).read()
    assert {str(k): str(v) for k, v in _parse_yaml_subset(text).items()} == {
        str(k): str(v) for k, v in yaml.safe_load(text).items()
    }
    prof = cluster_profile()
    assert prof["spark.sql.adaptive.enabled"] == "true"
    assert prof["spark.sql.shuffle.partitions"] == "10000"
    assert int(prof["spark.dynamicAllocation.maxExecutors"]) >= 1000
    assert all(isinstance(v, str) for v in prof.values())
    with pytest.raises(ValueError):
        get_spark(profile="nope")


def test_read_config_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        read_config("/nonexistent/nope.yaml")


def fixture_cfg(tmp_path, num_pages=2):
    fixture_dir = str(tmp_path / "pages")
    write_fixture_pages(fixture_dir, num_pages=num_pages, cards_per_page=8, seed=3)
    cfg = ExtractConfig(
        regions=[
            RegionConfig(name="jakarta", id="dki-jakarta", admins=ADMINS[:2]),
            RegionConfig(name="bogor", id="bogor", admins=ADMINS[2:]),
        ],
        num_pages=num_pages,
    )
    opts = {
        "fixture_dir": fixture_dir,
        "pages_per_partition": "1",
        "base_sleep": "0.0001",
        "min_sleep": "0.0",
    }
    return cfg, opts


def test_extract_all_regions_unions_with_region_column(spark, tmp_path):
    cfg, opts = fixture_cfg(tmp_path)
    df = extract_all_regions(spark, cfg, opts)
    assert "region" in df.columns
    counts = {r["region"]: r["n"] for r in df.groupBy("region").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"jakarta", "bogor"}
    assert counts["jakarta"] == counts["bogor"] == 16  # same fixture pages


def test_run_region_pipeline_dry_run_and_checkpoint(spark, tmp_path):
    cfg, opts = fixture_cfg(tmp_path)
    from etl_property_rumah123_spark.config import LoadConfig

    rc = run_region_pipeline(
        spark,
        cfg,
        LoadConfig(),
        cfg.regions[0],
        stage_dir=str(tmp_path / "stage"),
        run_date="20260813",
        source_options=opts,
    )
    assert rc == -1  # dry run (no sink configured)
    ckpt = spark.read.parquet(
        str(tmp_path / "stage" / "listings_jakarta_20260813.parquet")
    )
    assert ckpt.count() > 0
    links = [r["link"] for r in ckpt.select("link").collect()]
    assert len(links) == len(set(links))  # transform deduped before checkpoint


def test_runner_cli_dry_run(tmp_path):
    """The CLI surface end-to-end in-process: fixture-backed source,
    two regions, staged parquet, no sink. (Uses its own SparkSession
    via get_spark, like a spark-submit invocation would.)"""
    from etl_property_rumah123_spark import runner

    fixture_dir = str(tmp_path / "pages")
    write_fixture_pages(fixture_dir, num_pages=2, cards_per_page=8, seed=3)
    # CLI reads the reference-shaped YAML; write a 2-region copy with
    # the fixture's page count.
    cfg_path = str(tmp_path / "extract.yaml")
    with open(os.path.join(REPO, "configs/extract.yaml")) as f:
        text = f.read()
    with open(cfg_path, "w") as f:
        f.write(text.replace("num_pages: 20", "num_pages: 2"))

    rc = runner.main(
        [
            "--extract-config", cfg_path,
            "--load-config", os.path.join(REPO, "configs/load.yaml"),
            "--region", "jakarta",
            "--dry-run",
            "--stage-dir", str(tmp_path / "stage"),
            "--run-date", "20260813",
            "--source-option", f"fixture_dir={fixture_dir}",
            "--source-option", "pages_per_partition=1",
            "--source-option", "base_sleep=0.0001",
            "--source-option", "min_sleep=0.0",
        ]
    )
    assert rc == 0
    import glob as _glob

    staged = _glob.glob(str(tmp_path / "stage" / "listings_jakarta_*"))
    assert staged, "stage checkpoint written"


def test_runner_cli_rejects_unknown_region(tmp_path):
    from etl_property_rumah123_spark import runner

    with pytest.raises(SystemExit):
        runner.main(
            [
                "--extract-config", os.path.join(REPO, "configs/extract.yaml"),
                "--load-config", os.path.join(REPO, "configs/load.yaml"),
                "--region", "atlantis",
                "--dry-run",
            ]
        )


def test_check_unique_and_runner_pk_assertion(spark, tmp_path):
    """check_unique surfaces duplicated keys; the runner's opt-in PK
    assertion passes on the deduped pipeline (T2 guarantees it) and
    fails loudly on a planted duplicate."""
    from etl_property_rumah123_spark.config import LoadConfig
    from etl_property_rumah123_spark.operators.profiling import check_unique

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "link string, v long"
    )
    dups = check_unique(df, ["link"]).collect()
    assert [(r["link"], r["n_rows"]) for r in dups] == [("a", 2)]

    cfg, opts = fixture_cfg(tmp_path)
    rc = run_region_pipeline(
        spark, cfg, LoadConfig(), cfg.regions[0],
        source_options=opts, assert_unique_key=True,
    )
    assert rc == -1  # dry run completed: T2 output passed the PK gate
