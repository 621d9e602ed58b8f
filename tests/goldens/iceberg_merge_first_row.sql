MERGE INTO lake.db.t t USING cdc_batch_src s ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
                WHEN MATCHED AND NOT t._deleted AND s.op = 'D' THEN UPDATE SET t.text = NULL, t._ts_applied = s._src_ts, t._lsn_applied = s.lsn, t._deleted = true
                WHEN MATCHED AND NOT t._deleted AND (s._src_ts < t._ts_applied OR (s._src_ts = t._ts_applied AND s.lsn < t._lsn_applied)) AND s.op <> 'D' THEN UPDATE SET t.text = s.text, t.ts = s.ts, t._ts_applied = s._src_ts, t._lsn_applied = s.lsn, t._deleted = false
                WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, text, ts, _ts_applied, _lsn_applied, _deleted) VALUES (s.conv_id, s.turn_idx, CASE WHEN s.op = 'D' THEN NULL ELSE s.text END, CASE WHEN s.op = 'D' THEN NULL ELSE s.ts END, s._src_ts, s.lsn, s.op = 'D')
