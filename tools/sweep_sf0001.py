import sys, traceback
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from un_datapipeline_spark.registry import all_operators
spark = (SparkSession.builder.master("local[8]").appName("sweep")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF="/root/testdata/sf0.001"
fails=[]
for n, op in all_operators().items():
    try:
        rows = op.fn(spark, SF).limit(1000).collect()
    except Exception as ex:
        fails.append(n)
        print("FAIL", n, str(ex).split("\n")[0][:140])
print("TOTAL fails:", len(fails), fails)
spark.stop()
