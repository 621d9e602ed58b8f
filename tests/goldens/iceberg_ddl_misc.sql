ALTER TABLE lake.db.t ADD COLUMN tool string
ALTER TABLE lake.db.t ALTER COLUMN turn_idx TYPE bigint
ALTER TABLE lake.db.t SET TBLPROPERTIES ('cdc.last_batch_id' = '7')
