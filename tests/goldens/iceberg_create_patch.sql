CREATE TABLE IF NOT EXISTS lake.db.t (
              conv_id string, turn_idx int, text string, ts timestamp,
              _ts_applied timestamp, _lsn_applied bigint, _deleted boolean
            ) USING iceberg
            PARTITIONED BY (bucket(8, conv_id))
            TBLPROPERTIES (
              'write.distribution-mode' = 'hash',
              'write.spark.accept-any-schema' = 'true',
              'format-version' = '2',
              'write.merge.mode' = 'merge-on-read',
              'write.parquet.bloom-filter-enabled.column.conv_id' = 'true'
            )
