from blackroad_feature_store_spark.cli import main

main()
