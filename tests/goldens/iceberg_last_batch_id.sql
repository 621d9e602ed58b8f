SELECT summary['cdc.batch_id'] AS b FROM lake.db.t.snapshots
            WHERE summary['cdc.batch_id'] IS NOT NULL
            ORDER BY committed_at DESC LIMIT 1
