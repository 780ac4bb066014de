package graft.stubs;

import java.util.*;
import org.apache.kafka.common.TopicPartition;

/**
 * Scripted data + capture points for the signature-contract stubs
 * (test-only). The stubs under org.apache.kafka.* / software.amazon.* are
 * hand-written skeletons of the PUBLIC client APIs (shapes taken from the
 * published javadocs) whose sole purpose is to make the engine's
 * reflective bindings (KafkaAdminApi, AwsSnsTransport) execute their
 * Class.forName/getMethod paths in CI: a typo'd class or method name
 * fails here instead of in a live deployment.
 */
public final class StubData {
  public static Properties adminProps;
  public static Properties consumerProps;
  public static boolean includeAuthorizedOps;
  public static boolean requireStable;
  public static boolean adminClosed;
  public static boolean consumerClosed;

  public static LinkedHashMap<String, Integer> topics = new LinkedHashMap<>();
  public static Set<String> aclDenied = new HashSet<>();
  public static LinkedHashMap<String, Map<String, String>> configs = new LinkedHashMap<>();
  public static List<String> groups = new ArrayList<>();
  public static Map<String, Map<TopicPartition, Long>> committed = new HashMap<>();
  public static long lo;
  public static long hi;
  public static int brokerCount = 1;

  public static void reset() {
    adminProps = null;
    consumerProps = null;
    includeAuthorizedOps = false;
    requireStable = false;
    adminClosed = false;
    consumerClosed = false;
    topics = new LinkedHashMap<>();
    aclDenied = new HashSet<>();
    configs = new LinkedHashMap<>();
    groups = new ArrayList<>();
    committed = new HashMap<>();
    lo = 0L;
    hi = 0L;
    brokerCount = 1;
  }

  private StubData() {}
}
