"""Build dist/picsure_etl_spark.zip for ``spark-submit --py-files``."""

import os
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
PKG = "picsure_dictionary_etl_spark"
OUT = os.path.join(HERE, "dist", "picsure_etl_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(HERE, PKG)):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, HERE))
    print(OUT)


if __name__ == "__main__":
    main()
