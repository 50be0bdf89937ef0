from olake_spark.plans.ledger import Ledger  # noqa: F401
