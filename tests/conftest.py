import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_crawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "wcs-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=4,
    )
    yield s
    s.stop()


# Reference-shaped URL battery: every rule in SURVEY.md §2.B/§2.C has a case.
URL_CASES = [
    "https://example.com",
    "https://example.com/",
    "http://example.com/path/",
    "example.com/path/sub",
    "https://WWW.Example.com/Path",
    "https://example.com:8080/x",
    "https://www.example.com/a?b=c&d=e",
    "https://example.com/a#frag",
    "https://example.com/tag/news",
    "https://example.com/author/admin",
    "https://example.com/page/2/",
    "https://example.com/page/",
    "https://example.com/blog/page/12",
    "https://example.com/assets/app.css",
    "https://example.com/x.PNG",
    "https://example.com/x.png",
    "https://example.com/x.woff2",
    "https://example.com/deep/x.json",
    "https://example.com/?e-page-1a2b=3",
    "https://example.com/p?e-page-ZZ=3",
    "https://example.com/p?a=1&e-page-ff00=2",
    "https://example.com/static/docs/readme",
    "https://example.com/uploads/f",
    "https://example.com/wp-json/v2",
    "https://example.com/api/items",
    "https://example.com/p/5",
    "https://example.com/?page=2",
    "mailto:x@example.com",
    "tel:+15550100",
    "javascript:void(0)",
    "https://sub.example.com/x",
    "https://www.example.com",
    "ftp://example.com/x",
    "",
]
