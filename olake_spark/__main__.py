from olake_spark.cli import main

raise SystemExit(main())
