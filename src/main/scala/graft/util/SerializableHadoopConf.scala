package graft.util

import org.apache.hadoop.conf.Configuration

/** Hadoop `Configuration` is not java-Serializable; tasks that open
  * FileSystem streams directly (the streaming WARC record walker)
  * ship it through this wrapper, round-tripping via the
  * `write`/`readFields` Writable protocol — the same trick Spark's
  * own (private) SerializableConfiguration uses.
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
