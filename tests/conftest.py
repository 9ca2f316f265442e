import os

import pytest

from linkml_store_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # small shuffle-partition count: test data is tiny
    s = get_spark(app_name="linkml-store-spark-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


COUNTRIES = [
    {"name": "United States", "code": "US", "capital": "Washington, D.C.", "continent": "North America", "languages": ["English"]},
    {"name": "Canada", "code": "CA", "capital": "Ottawa", "continent": "North America", "languages": ["English", "French"]},
    {"name": "Mexico", "code": "MX", "capital": "Mexico City", "continent": "North America", "languages": ["Spanish"]},
    {"name": "Brazil", "code": "BR", "capital": "Brasília", "continent": "South America", "languages": ["Portuguese"]},
    {"name": "Argentina", "code": "AR", "capital": "Buenos Aires", "continent": "South America", "languages": ["Spanish"]},
    {"name": "United Kingdom", "code": "GB", "capital": "London", "continent": "Europe", "languages": ["English"]},
    {"name": "France", "code": "FR", "capital": "Paris", "continent": "Europe", "languages": ["French"]},
    {"name": "Germany", "code": "DE", "capital": "Berlin", "continent": "Europe", "languages": ["German"]},
    {"name": "Switzerland", "code": "CH", "capital": "Bern", "continent": "Europe", "languages": ["German", "French", "Italian", "Romansh"]},
    {"name": "Japan", "code": "JP", "capital": "Tokyo", "continent": "Asia", "languages": ["Japanese"]},
    {"name": "India", "code": "IN", "capital": "New Delhi", "continent": "Asia", "languages": ["Hindi", "English"]},
    {"name": "Egypt", "code": "EG", "capital": "Cairo", "continent": "Africa", "languages": ["Arabic"]},
]

PERSONS = [
    {"id": 1, "name": "n1", "age_in_years": 25, "history": [
        {"event": "started job", "date": "2021-01-01", "organization": "Org1"},
        {"event": "moved", "date": "2021-02-01", "organization": None},
    ]},
    {"id": 2, "name": "n2", "age_in_years": None, "history": [
        {"event": "started job", "date": "2020-05-01", "organization": "Org2"},
    ]},
    {"id": 3, "name": "n3", "age_in_years": 40, "history": None},
]


@pytest.fixture()
def countries():
    return [dict(c) for c in COUNTRIES]


@pytest.fixture()
def persons():
    return [dict(p) for p in PERSONS]
