"""Dataset catalog: the ``splink_datasets`` equivalent (SURVEY §2.1).

Reference: splink/internals/datasets/metadata.py + splink_datasets.py — a
lazy catalog of demo datasets (fake_1000, historical_50k, febrl3/4a/4b)
downloaded from the public splink_datasets repo and cached locally.

Native rewrite, Spark-first and offline-capable:
- metadata mirrors the reference catalog (name, public URL, row counts,
  schema) so ``list_downloadable_datasets``-style discovery works;
- ``SplinkDatasets(spark)`` properties return **Spark DataFrames**;
- resolution order per dataset: local cache file → download from the public
  URL (if the environment has network) → a clearly-labelled DETERMINISTIC
  SYNTHETIC stand-in with the documented schema, so demos and tests run in
  air-gapped environments. The synthetic data is generated, never shipped.
"""

from __future__ import annotations

import logging
import os
import random
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

logger = logging.getLogger(__name__)

_DATA_REPO = (
    "https://raw.githubusercontent.com/"
    "moj-analytical-services/splink_datasets/master/data"
)


@dataclass(frozen=True)
class DatasetMetadata:
    """Mirrors reference datasets/metadata.py:_DataSetMetaData."""

    dataset_name: str
    url: str
    rows: str
    unique_entities: str
    description: str = ""
    data_format: str = "csv"
    columns: tuple = field(default=())


_FEBRL_COLUMNS = (
    "rec_id", "given_name", "surname", "street_number", "address_1",
    "address_2", "suburb", "postcode", "state", "date_of_birth", "soc_sec_id",
)

DATASETS: dict[str, DatasetMetadata] = {
    "fake_1000": DatasetMetadata(
        "fake_1000",
        f"{_DATA_REPO}/fake_1000.csv",
        "1,000",
        "250",
        "250 simulated people with varying numbers of duplicates, labelled.",
        "csv",
        ("unique_id", "first_name", "surname", "dob", "city", "email", "cluster"),
    ),
    "historical_50k": DatasetMetadata(
        "historical_50k",
        f"{_DATA_REPO}/historical_figures_with_errors_50k.parquet",
        "50,000",
        "5,156",
        "Historical persons scraped from wikidata with injected errors.",
        "parquet",
        (
            "unique_id", "cluster", "full_name", "first_and_surname",
            "first_name", "surname", "dob", "birth_place", "postcode_fake",
            "gender", "occupation",
        ),
    ),
    "febrl3": DatasetMetadata(
        "febrl3",
        f"{_DATA_REPO}/febrl/dataset3.csv",
        "5,000",
        "2,000",
        "FEBRL dataset 3: 2000 originals + 3000 duplicates.",
        "csv",
        _FEBRL_COLUMNS,
    ),
    "febrl4a": DatasetMetadata(
        "febrl4a",
        f"{_DATA_REPO}/febrl/dataset4a.csv",
        "5,000",
        "5,000",
        "FEBRL dataset 4a: 5000 original records.",
        "csv",
        _FEBRL_COLUMNS,
    ),
    "febrl4b": DatasetMetadata(
        "febrl4b",
        f"{_DATA_REPO}/febrl/dataset4b.csv",
        "5,000",
        "5,000",
        "FEBRL dataset 4b: 5000 duplicated records of 4a.",
        "csv",
        _FEBRL_COLUMNS,
    ),
}

DATASET_LABELS: dict[str, DatasetMetadata] = {
    "fake_1000_labels": DatasetMetadata(
        "fake_1000_labels",
        f"{_DATA_REPO}/fake_1000_labels.csv",
        "3,176",
        "n/a",
        "Clerical labels for fake_1000.",
        "csv",
        ("unique_id_l", "source_dataset_l", "unique_id_r", "source_dataset_r",
         "clerical_match_score"),
    ),
}


def list_downloadable_datasets() -> list[str]:
    return sorted(DATASETS)


# ---------------------------------------------------------------------------
# deterministic synthetic stand-ins (offline fallback)
# ---------------------------------------------------------------------------

_FIRST = ["julia", "oliver", "grace", "amir", "zoe", "noah", "theo", "freya",
          "arthur", "isla", "leo", "maya", "rosa", "ethan", "lena", "hugo"]
_SUR = ["taylor", "smith", "jones", "khan", "li", "brown", "davies", "evans",
        "wilson", "thomas", "clarke", "walker", "wright", "green", "hall"]
_CITY = ["london", "leeds", "manchester", "bristol", "york", "bath", "derby"]


def _typo(rng: random.Random, s: Optional[str]) -> Optional[str]:
    if not s or len(s) < 3:
        return s
    i = rng.randrange(len(s) - 1)
    return s[:i] + s[i + 1] + s[i] + s[i + 2:]


def _synthetic_fake_1000(rng: random.Random) -> tuple[list, list[str]]:
    rows = []
    uid = 0
    for cluster in range(250):
        fn = rng.choice(_FIRST)
        sn = rng.choice(_SUR)
        dob = f"{rng.randrange(1950, 2010)}-{rng.randrange(1, 13):02d}-{rng.randrange(1, 29):02d}"
        city = rng.choice(_CITY)
        email = f"{fn}.{sn}{cluster}@mail.com"
        n_dupes = rng.choice([1, 1, 2, 2, 3, 4, 5, 6])
        for d in range(n_dupes):
            r_fn, r_sn, r_city, r_email = fn, sn, city, email
            if d > 0:
                corruption = rng.randrange(4)
                if corruption == 0:
                    r_fn = _typo(rng, fn)
                elif corruption == 1:
                    r_sn = _typo(rng, sn)
                elif corruption == 2:
                    r_city = None
                else:
                    r_email = None
            rows.append((uid, r_fn, r_sn, dob, r_city, r_email, cluster))
            uid += 1
        if uid >= 1000:
            break
    return rows, list(DATASETS["fake_1000"].columns)


def _synthetic_febrl(rng: random.Random, name: str, duplicated: bool) -> tuple[list, list[str]]:
    rows = []
    for i in range(1000):
        tag = "dup" if duplicated and i % 2 else "org"
        fn, sn = rng.choice(_FIRST), rng.choice(_SUR)
        rows.append((
            f"rec-{i}-{tag}",
            _typo(rng, fn) if tag == "dup" else fn,
            sn,
            str(rng.randrange(1, 300)),
            f"{rng.choice(_SUR)} street",
            None,
            rng.choice(_CITY),
            f"{rng.randrange(1000, 9999)}",
            rng.choice(["nsw", "vic", "qld"]),
            f"{rng.randrange(1940, 2005)}{rng.randrange(1, 13):02d}{rng.randrange(1, 29):02d}",
            str(rng.randrange(10**6, 10**7)),
        ))
    return rows, list(_FEBRL_COLUMNS)


def _synthetic_historical(rng: random.Random) -> tuple[list, list[str]]:
    rows = []
    uid = 0
    for cluster in range(500):
        fn, sn = rng.choice(_FIRST), rng.choice(_SUR)
        dob = f"{rng.randrange(1700, 1900)}-01-{rng.randrange(1, 29):02d}"
        place = rng.choice(_CITY)
        occ = rng.choice(["writer", "politician", "painter", "scientist"])
        for d in range(rng.choice([1, 2, 2, 3])):
            r_fn = _typo(rng, fn) if d and rng.random() < 0.5 else fn
            rows.append((
                f"Q{cluster}-{d}", f"Q{cluster}", f"{r_fn} {sn}",
                f"{r_fn} {sn}", r_fn, sn, dob, place,
                f"{rng.choice(['ab', 'cd'])}{rng.randrange(1, 99)} {rng.randrange(1, 9)}xy",
                rng.choice(["male", "female"]), occ,
            ))
            uid += 1
    return rows, list(DATASETS["historical_50k"].columns)


class SplinkDatasets:
    """``splink_datasets`` equivalent returning Spark DataFrames.

    cache_dir defaults to ``$SPLINK_SPARK_DATASET_DIR`` or
    ``~/.splink_spark_datasets``.
    """

    def __init__(self, spark: SparkSession, cache_dir: Optional[str] = None):
        self._spark = spark
        self._cache: dict[str, DataFrame] = {}
        self.cache_dir = cache_dir or os.environ.get(
            "SPLINK_SPARK_DATASET_DIR",
            os.path.join(os.path.expanduser("~"), ".splink_spark_datasets"),
        )

    # -- resolution ----------------------------------------------------------
    def _load(self, name: str) -> DataFrame:
        if name in self._cache:
            return self._cache[name]
        meta = DATASETS[name]
        local = os.path.join(self.cache_dir, f"{name}.{meta.data_format}")
        df: Optional[DataFrame] = None
        if os.path.exists(local):
            df = self._read_file(local, meta.data_format)
        else:
            df = self._try_download(meta, local)
        if df is None:
            logger.warning(
                "dataset %s: no cache and no network — returning a "
                "DETERMINISTIC SYNTHETIC stand-in with the documented schema "
                "(NOT the real data)", name,
            )
            df = self._synthetic(name)
        self._cache[name] = df
        return df

    def _read_file(self, path: str, fmt: str) -> DataFrame:
        if fmt == "csv":
            return self._spark.read.csv(path, header=True, inferSchema=True)
        return self._spark.read.parquet(path)

    def _try_download(self, meta: DatasetMetadata, local: str) -> Optional[DataFrame]:
        from urllib.request import urlopen

        try:
            with urlopen(meta.url, timeout=10) as resp:  # nosec: public data repo
                payload = resp.read()
            os.makedirs(self.cache_dir, exist_ok=True)
            with open(local, "wb") as f:
                f.write(payload)
            return self._read_file(local, meta.data_format)
        except Exception as exc:  # offline / DNS failure / 404
            logger.info("dataset %s download failed: %s", meta.dataset_name, exc)
            return None

    def _synthetic(self, name: str) -> DataFrame:
        rng = random.Random(hash(name) % (2**31))
        if name == "fake_1000":
            rows, cols = _synthetic_fake_1000(rng)
        elif name == "historical_50k":
            rows, cols = _synthetic_historical(rng)
        elif name.startswith("febrl"):
            rows, cols = _synthetic_febrl(rng, name, duplicated=name == "febrl4b")
        else:
            raise ValueError(f"no synthetic generator for dataset {name!r}")
        return self._spark.createDataFrame(rows, cols)

    # -- catalog -------------------------------------------------------------
    @property
    def fake_1000(self) -> DataFrame:
        return self._load("fake_1000")

    @property
    def historical_50k(self) -> DataFrame:
        return self._load("historical_50k")

    @property
    def febrl3(self) -> DataFrame:
        return self._load("febrl3")

    @property
    def febrl4a(self) -> DataFrame:
        return self._load("febrl4a")

    @property
    def febrl4b(self) -> DataFrame:
        return self._load("febrl4b")


class SplinkDatasetLabels(SplinkDatasets):
    """``splink_dataset_labels`` equivalent (reference
    internals/datasets/splink_datasets.py:168-186): clerical-label tables for
    the demo datasets, as Spark DataFrames. Shares the download/cache/synthetic
    machinery of :class:`SplinkDatasets`; the offline stand-in derives
    ground-truth pair labels from the synthetic ``fake_1000`` clusters."""

    def _load(self, name: str) -> DataFrame:
        if name in self._cache:
            return self._cache[name]
        meta = DATASET_LABELS[name]
        local = os.path.join(self.cache_dir, f"{name}.{meta.data_format}")
        df: Optional[DataFrame] = None
        if os.path.exists(local):
            df = self._read_file(local, meta.data_format)
        else:
            df = self._try_download(meta, local)
        if df is None:
            logger.warning(
                "dataset %s: no cache and no network — returning a "
                "DETERMINISTIC SYNTHETIC stand-in with the documented schema "
                "(NOT the real data)", name,
            )
            df = self._synthetic(name)
        self._cache[name] = df
        return df

    def _synthetic(self, name: str) -> DataFrame:
        if name != "fake_1000_labels":
            raise ValueError(f"no synthetic generator for dataset {name!r}")
        rng = random.Random(hash("fake_1000") % (2**31))
        rows, cols = _synthetic_fake_1000(rng)
        cluster_idx = cols.index("cluster")
        uid_idx = cols.index("unique_id")
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r[cluster_idx], []).append(r[uid_idx])
        label_rows = []
        for members in by_cluster.values():
            members = sorted(members)
            for i, l in enumerate(members):
                for r in members[i + 1:]:
                    label_rows.append((l, "fake_1000", r, "fake_1000", 1.0))
        return self._spark.createDataFrame(
            label_rows, list(DATASET_LABELS["fake_1000_labels"].columns)
        )

    @property
    def fake_1000_labels(self) -> DataFrame:
        return self._load("fake_1000_labels")


def splink_dataset_labels(
    spark: Optional[SparkSession] = None, cache_dir: Optional[str] = None
) -> SplinkDatasetLabels:
    """Name-parity factory for the reference's ``splink_dataset_labels``
    singleton (splink/datasets.py)."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "splink_dataset_labels needs a SparkSession (none active): "
            "splink_dataset_labels(spark)"
        )
    return SplinkDatasetLabels(spark, cache_dir=cache_dir)


def splink_datasets(
    spark: Optional[SparkSession] = None, cache_dir: Optional[str] = None
) -> SplinkDatasets:
    """Name-parity factory for the reference's ``splink_datasets`` singleton
    (splink/datasets.py). The reference's is import-time global; Spark
    DataFrames need a session, so this takes one (defaulting to the active
    session)."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "splink_datasets needs a SparkSession (none active): "
            "splink_datasets(spark)"
        )
    return SplinkDatasets(spark, cache_dir=cache_dir)


class SplinkDataUtils:
    """Cache management for the dataset catalog (reference
    internals/datasets/utils.py SplinkDataUtils)."""

    def __init__(self, cache_dir: Optional[str] = None):
        self.cache_dir = cache_dir or os.environ.get(
            "SPLINK_SPARK_DATASET_DIR",
            os.path.join(os.path.expanduser("~"), ".splink_spark_datasets"),
        )

    def _list_downloaded_data_files(self) -> list:
        if not os.path.isdir(self.cache_dir):
            return []
        return sorted(os.listdir(self.cache_dir))

    def list_downloaded_datasets(self) -> list:
        """Datasets already present in the local cache."""
        return [f.split(".")[0] for f in self._list_downloaded_data_files()]

    def list_all_datasets(self) -> list:
        """Every dataset the catalog knows, downloaded or not."""
        return [m.dataset_name for m in DATASETS.values()]

    def list_all_dataset_labels(self) -> list:
        """Every labels dataset the catalog knows."""
        return [m.dataset_name for m in DATASET_LABELS.values()]

    def show_downloaded_data(self) -> None:
        print(
            "Datasets already downloaded and available:\n"
            + ",\n".join(self.list_downloaded_datasets())
        )

    def clear_downloaded_data(self, datasets: Optional[list] = None) -> None:
        """Delete cached downloads (all catalog datasets when None)."""
        known = set(self.list_all_datasets()) | set(self.list_all_dataset_labels())
        targets = known if datasets is None else set(datasets) & known
        for f in self._list_downloaded_data_files():
            if f.split(".")[0] in targets:
                os.remove(os.path.join(self.cache_dir, f))


def splink_dataset_utils(cache_dir: Optional[str] = None) -> SplinkDataUtils:
    """Name-parity factory for the reference's ``splink_dataset_utils``
    singleton (internals/datasets/__init__.py)."""
    return SplinkDataUtils(cache_dir=cache_dir)
