from terrakit_spark.cli import main

main()
