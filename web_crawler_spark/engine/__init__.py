from web_crawler_spark.engine.crawl import CrawlConfig, CrawlEngine  # noqa: F401
