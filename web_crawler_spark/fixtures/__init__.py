from web_crawler_spark.fixtures.webgraph import (  # noqa: F401
    WebGraphConfig,
    generate_pages,
    generate_robots,
    generate_sites,
    pages_as_oracle_dict,
)
